"""Document chunking — RAG/embedding prep for training-data pipelines.

Beyond-reference surface (the reference's lab2 ingests pre-chunked
documents from object storage; assets/lab2/*.md): split each document
into overlapping token-window chunks ready for embedding.

Spark-first: the whole operator is one JVM expression chain —
``split`` → ``sequence`` of window starts → ``posexplode`` → ``slice`` +
``array_join``. Map-only (the explode multiplies rows inside the task,
no exchange), fuses into the parquet scan, and every step is
list-function arithmetic DuckDB replays exactly, so chunk boundaries and
contents are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_cols: list[str] | None = None,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
    chunk_col: str = "chunk",
) -> DataFrame:
    """One row per (document, chunk): ``chunk_id``, ``n_chunk_tokens``,
    ``chunk_col``. Chunks are ``chunk_tokens`` whitespace tokens long and
    start every ``chunk_tokens - overlap_tokens`` tokens; the final chunk
    may be shorter (standard sliding-window chunking).
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    ids = id_cols or [df.columns[0]]
    stride = chunk_tokens - overlap_tokens
    # null/blank documents have nothing to chunk — emitting a phantom
    # empty chunk would get embedded and indexed downstream (rag_ingest)
    df = df.filter(F.trim(F.col(text_col)) != "")

    words = tokens(text_col)
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(stride)
    )
    piece = F.slice(F.col("__words"), F.col("__start") + 1, chunk_tokens)
    return (
        df.select(*ids, words.alias("__words"), starts.alias("__starts"))
        .select(
            *ids,
            "__words",
            F.posexplode("__starts").alias("chunk_id", "__start"),
        )
        .select(
            *ids,
            "chunk_id",
            F.size(piece).alias("n_chunk_tokens"),
            F.array_join(piece, " ").alias(chunk_col),
        )
    )
