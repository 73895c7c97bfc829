"""salted_join: result parity with a plain join, and the salted key shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.skew import salted_join
from quickstart_streaming_agents_spark.sources.parquet import load_table

from .conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    lineitem = load_table(spark, SF_DIR, "lineitem")  # skewed side
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    got = salted_join(lineitem, orders, on=["l_orderkey"], salt=8)
    want = lineitem.join(orders, on="l_orderkey")
    assert got.count() == want.count()
    g = got.agg(F.sum("o_totalprice"), F.sum("l_extendedprice")).collect()[0]
    w = want.agg(F.sum("o_totalprice"), F.sum("l_extendedprice")).collect()[0]
    assert g == w
    assert "__salt" not in got.columns


def test_salted_join_spreads_hot_key(spark):
    # one logical key, many rows: with salt=8 the shuffle key (key, salt)
    # has 8 distinct values instead of 1
    hot = spark.range(10000).select(F.lit(1).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(1, "x")], ["k", "v"])
    out = salted_join(hot, dim, on=["k"], salt=8)
    assert out.count() == 10000
    from quickstart_streaming_agents_spark.operators.skew import SALT

    salted = hot.withColumn(
        SALT, F.pmod(F.xxhash64("k", "id"), F.lit(8))
    )
    assert salted.select(SALT).distinct().count() == 8


def test_grouped_topk_hot_key_matches_plain_window(spark):
    """One key holding 50k of 51k rows (pathological skew): the salted
    two-stage top-k must return exactly the plain-window answer, for
    several k and bucket counts including salt_buckets=1 (degenerate ==
    plain) and k > group size (short groups emit all rows)."""
    from pyspark.sql import Window

    from quickstart_streaming_agents_spark.operators.topk import grouped_topk

    rows = [("hot", i, float((i * 7919) % 10007)) for i in range(50_000)]
    rows += [("cold", 100_000 + i, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "k string, id long, v double")

    for k, buckets in [(3, 64), (10, 8), (5, 1), (7, 64)]:
        w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("id"))
        want = {
            (r.k, r.id, r.rk)
            for r in df.select(
                "k", "id", F.row_number().over(w).alias("rk")
            ).filter(F.col("rk") <= k).collect()
        }
        got = {
            (r.k, r.id, r.rk)
            for r in grouped_topk(
                df, ["k"], [F.col("v").desc(), F.col("id")], k,
                salt_buckets=buckets,
            ).collect()
        }
        assert got == want, (k, buckets)


def test_classifier_refuses_column_clash(spark):
    import pytest

    from quickstart_streaming_agents_spark.operators.sampling import (
        hashed_linear_classifier_score,
    )

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overwrite input"):
        hashed_linear_classifier_score(df.withColumn("keep", F.lit(True)), "text")


def test_winnowing_guarantee_shared_run(spark):
    """Schleimer et al.'s local guarantee: two documents sharing any run
    of >= window+gram_words-1 = 6 tokens share at least one
    fingerprint, regardless of where the run sits in either document."""
    from quickstart_streaming_agents_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token run
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"{shared} seven eight nine ten eleven twelve"),
        (3, "totally different words with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps: dict[int, set] = {}
    for r in winnowing_fingerprints(df, "doc_id", "text").collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "guaranteed shared fingerprint missing"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_pagerank_int_hand_computed_and_partition_invariant(spark):
    """Integer PageRank on a hand-checkable 3-cycle plus a dangler:
    ranks follow the exact fixed-point recurrence, identical under any
    partitioning (BIGINT ops commute), and a multi-edge counts once
    per edge."""
    from quickstart_streaming_agents_spark.operators.components import (
        pagerank_int,
    )

    # 0 -> 1, 1 -> 2, 2 -> 0 (cycle): every node keeps rank 1_000_000
    # under r' = 150000 + 85 * (r // 1) // 100 = 150000 + 850000
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    cyc = [(0, 1), (1, 2), (2, 0), (3, 0), (3, 0)]  # 3 is a multi-edge src
    edges = spark.createDataFrame(cyc, "src long, dst long")
    got = {r.node: r.rank_scaled
           for r in pagerank_int(edges, nodes, iters=1).collect()}
    # node 0 receives from 2 (deg 1) and TWO edges from 3 (deg 2):
    # 150000 + 85*(1000000 + 2*500000)//100
    assert got[0] == 150000 + 85 * 2_000_000 // 100
    assert got[1] == got[2] == 1_000_000
    assert got[3] == 150_000  # dangler receives nothing

    big_edges = edges.repartition(7)
    got2 = {r.node: r.rank_scaled
            for r in pagerank_int(big_edges, nodes.repartition(5),
                                  iters=3).collect()}
    got3 = {r.node: r.rank_scaled
            for r in pagerank_int(edges.coalesce(1), nodes.coalesce(1),
                                  iters=3).collect()}
    assert got2 == got3  # bit-identical under any partitioning

    import pytest

    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_int(edges, nodes, damping_pct=0)
