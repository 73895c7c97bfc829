"""Sequence packing — fixed-length training-example assembly.

Beyond-reference surface (the reference stops at per-document curation;
its lab2 ships documents to a vector store as-is): an LLM pre-training
job consumes fixed-length token sequences, so the last pipeline stage
concatenates curated documents into a token stream and cuts it every
``seq_len`` tokens (GPT-style concat-and-chunk packing — documents cross
sequence boundaries, nothing is padded or dropped except the stream
tail). This operator computes the exact (document, sequence) assignment
table for that layout.

Spark-first plan: packing is inherently sequential — a document's
offset is the sum of every earlier document's length — so the stream is
sharded into ``num_buckets`` independent streams by a deterministic
key hash, and the sequential prefix-sum runs per bucket as ONE window
aggregation (the operator's only shuffle). Everything after the cumsum
is per-row integer arithmetic plus an in-task ``explode`` for documents
spanning several sequences: whole-stage codegen, no Python.

At 100 TB the bucket count is the parallelism knob: each bucket's
window sort is one task, so pick ``num_buckets`` ≈ corpus_tokens /
(a few hundred M tokens) and the sort stays comfortably in-memory per
task while every core stays busy. Determinism holds at any bucket
count (the assignment within a bucket depends only on ids and lengths,
and buckets are independent), which is what makes the layout
reproducible across re-runs and cluster sizes — resizing the cluster
must not reshuffle which tokens land in which training sequence.

Every step is integer arithmetic, so a SQL oracle replays the operator
bit-for-bit (see ``sequence_packing`` in queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.text import token_count


def doc_token_count(text_col: str):
    """Whitespace token count with the blank-document guard (split('')
    yields [''] and would count 1) — the ONE counting rule batch and
    streaming packing share."""
    return F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        token_count(text_col)
    )


def bucket_of(id_col: str, num_buckets: int):
    """The shared bucket key: pmod keeps it non-negative for any id."""
    return F.pmod(F.col(id_col), F.lit(int(num_buckets))).cast("long")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 256,
    num_buckets: int = 8,
    tokens_col: str | None = None,
) -> DataFrame:
    """Assign every document to fixed-length packed training sequences.

    Documents are sharded into ``num_buckets`` streams by
    ``pmod(id, buckets)`` (non-negative bucket even for negative ids; for
    non-negative ids this equals plain ``%``, which is what the SQL
    oracle replays), laid out within each stream in ``id_col`` order, and
    the stream is cut every ``seq_len`` whitespace tokens. Empty and
    whitespace-only documents are excluded (they carry no tokens). One
    output row per (document, sequence) fragment:

    - ``bucket``, ``seq_id`` — which packed sequence (per bucket).
    - ``doc_tok_start`` — offset of the fragment inside the document.
    - ``seq_tok_start`` — offset of the fragment inside the sequence.
    - ``n_seq_tokens`` — fragment length; sums to ``seq_len`` per filled
      sequence and to the document's token count per document.

    Single shuffle (the per-bucket cumulative sum); the span explode is
    in-task. All-integer, deterministic, cluster-size independent.

    ``tokens_col`` names a precomputed token-count column (e.g. from an
    upstream curation stage) to use instead of counting ``text_col`` —
    the norm when packing runs last in a pipeline that already counted.
    """
    if seq_len <= 0 or num_buckets <= 0:
        raise ValueError("seq_len and num_buckets must be positive")
    L = F.lit(int(seq_len))
    n_toks = (
        F.col(tokens_col) if tokens_col is not None else doc_token_count(text_col)
    )
    base = df.select(
        F.col(id_col),
        bucket_of(id_col, num_buckets).alias("bucket"),
        n_toks.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        base.withColumn("tok_end", F.sum("n_tokens").over(w))
        .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
    )
    exploded = spans.withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                F.expr(f"tok_start div {int(seq_len)}"),
                F.expr(f"(tok_end - 1) div {int(seq_len)}"),
            )
        ),
    )
    seg_start = F.greatest(F.col("tok_start"), F.col("seq_id") * L)
    seg_end = F.least(F.col("tok_end"), (F.col("seq_id") + 1) * L)
    return exploded.select(
        id_col,
        "bucket",
        "seq_id",
        (seg_start - F.col("tok_start")).alias("doc_tok_start"),
        (seg_start - F.col("seq_id") * L).alias("seq_tok_start"),
        (seg_end - seg_start).alias("n_seq_tokens"),
    )
