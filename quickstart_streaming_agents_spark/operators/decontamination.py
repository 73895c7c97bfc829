"""Benchmark decontamination — n-gram overlap removal.

Beyond-reference surface: before training, any document sharing a long
word n-gram with an evaluation benchmark must be flagged/dropped, or the
benchmark is compromised (the public recipe: GPT-3 appendix C / PaLM
used 13-gram overlap; Lee et al. 2022 substring dedup is the same idea
intra-corpus).

Spark-first plan: shingle both sides with the dedup module's JVM n-gram
machinery (``operators/dedup.shingle_df`` — distinct n-grams per doc,
case-normalized here), collapse shingles to ``xxhash64`` 8-byte keys, and
**broadcast the benchmark's shingle set** — eval benchmarks are MBs, so
at 100 TB the corpus streams map-only through a broadcast-hash semi-join:
zero shuffle of corpus text, one tiny per-doc count aggregate keyed by
doc id. ``broadcast_benchmark=False`` switches to a shuffle hash join for
abnormally large benchmark sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_df


def _norm_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    normed = df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.lower(F.col(text_col)).alias("__norm_text"),
    )
    return shingle_df(normed, id_col, "__norm_text", n, keep_cols=keep_cols)


def contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """``df`` + ``n_contaminated_ngrams`` + ``contaminated`` per row.

    A doc is contaminated when it shares ≥1 lowercased word ``n``-gram
    with any benchmark text. Docs (or benchmark items) shorter than ``n``
    tokens emit no shingles and can never match — the standard contract.
    """
    corp = _norm_shingles(df, id_col, text_col, n).select(
        "doc_id", F.xxhash64("shingle").alias("h")
    )
    bench = (
        _norm_shingles(
            benchmark.select(
                F.lit(0).alias("__bid"),
                F.col(bench_text_col or text_col).alias("__btext"),
            ),
            "__bid",
            "__btext",
            n,
        )
        .select(F.xxhash64("shingle").alias("h"))
        .distinct()
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    # shingle_df emits DISTINCT shingles per doc, so a plain count equals
    # countDistinct without its extra (doc_id, h) exchange; only matched
    # rows reach this aggregate.
    hits = (
        corp.join(bench, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
        .withColumnRenamed("doc_id", "__hit_id")
    )
    if broadcast_benchmark:
        # contaminated docs are rare by construction (they overlap the
        # benchmark) — broadcast the flags so the corpus never shuffles
        hits = F.broadcast(hits)
    joined = df.join(hits, df[id_col] == F.col("__hit_id"), "left")
    return joined.select(
        *[df[c] for c in df.columns],
        F.coalesce("n_contaminated_ngrams", F.lit(0).cast("long")).alias(
            "n_contaminated_ngrams"
        ),
        (F.coalesce("n_contaminated_ngrams", F.lit(0).cast("long")) > 0).alias(
            "contaminated"
        ),
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The filtering form: rows of ``df`` with zero benchmark overlap."""
    flagged = contamination_flags(
        df, benchmark, id_col, text_col, bench_text_col, n, broadcast_benchmark
    )
    return flagged.filter(~F.col("contaminated")).drop(
        "n_contaminated_ngrams", "contaminated"
    )
