"""Approximate nearest-neighbor search over embedding columns.

Beyond-reference surface: the reference's VECTOR_SEARCH_AGG delegates ANN
to MongoDB Atlas (numCandidates=500); this engine owns the search.

- ``knn_bruteforce`` — exact top-k via the broadcast-matrix path
  (functions/vector.vector_search); the correctness baseline.
- ``ann_lsh`` — random-hyperplane LSH: sign-bit bucket per probe table,
  equi-join on (table, bucket), exact re-rank within buckets. The shuffle
  is keyed on hash buckets, never all-pairs — the 100 TB path. Recall is
  tunable via (num_planes, num_tables) and measured in tests against the
  brute-force baseline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quickstart_streaming_agents_spark.functions.vector import vector_search

knn_bruteforce = vector_search


def _hyperplanes(dim: int, num_planes: int, num_tables: int, seed: int = 42):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((num_tables, num_planes, dim))


def _bucket_df(df: DataFrame, id_col: str, emb_col: str, planes) -> DataFrame:
    """(item_id, table, bucket) — sign-bit LSH bucket per probe table.

    Ids only: embeddings are joined back for re-rank AFTER candidate
    dedup, so the (table, bucket) shuffle moves 3 longs per row per table
    instead of the full vector — at 1536-dim × 8 tables that's the
    difference between shuffling ~100 B/row and ~100 KB/row."""
    num_tables, num_planes, _ = planes.shape
    out_schema = T.StructType(
        [
            T.StructField("item_id", T.LongType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )
    src = df.select(F.col(id_col).cast("long").alias("item_id"), F.col(emb_col).alias("__emb"))
    b_planes = df.sparkSession.sparkContext.broadcast(planes)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        pl = b_planes.value  # (tables, planes, dim)
        pows = (2 ** np.arange(num_planes)).astype(np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["__emb"].to_numpy()).astype(np.float64)  # (n, dim)
            ids = pdf["item_id"].to_numpy().astype(np.int64)
            # all tables in one matmul: (n, tables*planes) sign bits
            bits = (X @ pl.reshape(num_tables * num_planes, -1).T) > 0
            buckets = bits.reshape(len(pdf), num_tables, num_planes).astype(np.int64) @ pows
            yield pd.DataFrame(
                {
                    "item_id": np.repeat(ids, num_tables),
                    "table": np.tile(np.arange(num_tables, dtype=np.int32), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )

    return src.mapInPandas(compute, schema=out_schema)


def ann_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    emb_col: str = "embedding",
    k: int = 3,
    num_planes: int = 8,
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Top-k (approximate) cosine matches: (query_id, match_id, score, rk).

    Candidates = bucket collisions in any probe table; exact cosine re-rank.
    """
    dim = len(corpus.select(emb_col).first()[0])
    planes = _hyperplanes(dim, num_planes, num_tables, seed)
    qb = _bucket_df(queries, query_id, emb_col, planes)
    cb = _bucket_df(corpus, corpus_id, emb_col, planes)
    # ids-only candidate pairs, deduped across probe tables BEFORE any
    # vector touches a shuffle
    cand = (
        qb.alias("q")
        .join(
            cb.alias("c"),
            (F.col("q.table") == F.col("c.table")) & (F.col("q.bucket") == F.col("c.bucket")),
        )
        .select(
            F.col("q.item_id").alias("query_id"),
            F.col("c.item_id").alias("match_id"),
        )
        .distinct()
    )
    # re-rank: query side is the small side (broadcast); corpus side is an
    # equi-join on match_id (one hash shuffle of candidates vs corpus)
    qe = queries.select(
        F.col(query_id).cast("long").alias("query_id"), F.col(emb_col).alias("qe")
    )
    ce = corpus.select(
        F.col(corpus_id).cast("long").alias("match_id"), F.col(emb_col).alias("ce")
    )
    cand = cand.join(F.broadcast(qe), "query_id").join(ce, "match_id")
    dot = F.expr("aggregate(zip_with(qe, ce, (x, y) -> x * double(y)), 0D, (acc, v) -> acc + v)")
    norm = F.sqrt(F.expr("aggregate(qe, 0D, (a, v) -> a + v * double(v))")) * F.sqrt(
        F.expr("aggregate(ce, 0D, (a, v) -> a + v * double(v))")
    )
    scored = cand.withColumn("score", dot / norm).drop("qe", "ce")
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("match_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "match_id", F.round("score", 6).alias("score"), "rk")
    )
