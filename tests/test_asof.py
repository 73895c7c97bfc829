"""asof_join semantics: inclusivity, ties, tolerance, atomic payload fill."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from quickstart_streaming_agents_spark.operators.asof import asof_join


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _frames(spark):
    probe = spark.createDataFrame(
        [Row(k="a", ts=_ts(10), pv=1), Row(k="a", ts=_ts(20), pv=2),
         Row(k="b", ts=_ts(5), pv=3), Row(k="c", ts=_ts(10), pv=4)]
    )
    build = spark.createDataFrame(
        [Row(k="a", ts=_ts(10), q=100, tb=1), Row(k="a", ts=_ts(10), q=200, tb=2),
         Row(k="a", ts=_ts(15), q=300, tb=3), Row(k="b", ts=_ts(9), q=400, tb=4)]
    )
    return probe, build


def test_backward_inclusive_and_ties(spark):
    probe, build = _frames(spark)
    out = {
        (r.k, r.ts.second): (r.q_asof, r.tb_asof)
        for r in asof_join(
            probe, build, on=["k"], right_cols=["q"], right_tiebreak="tb"
        ).collect()
    }
    # equal-ts build row is eligible; tie at ts=10 resolved by greatest tb
    assert out[("a", 10)] == (200, 2)
    assert out[("a", 20)] == (300, 3)
    # b: build at 9 <= probe at 5 is false → no match
    assert out[("b", 5)] == (None, None)
    # c: key never appears on build side
    assert out[("c", 10)] == (None, None)


def test_strict_excludes_equal_ts(spark):
    probe, build = _frames(spark)
    out = {
        (r.k, r.ts.second): r.q_asof
        for r in asof_join(
            probe, build, on=["k"], right_cols=["q"], right_tiebreak="tb",
            strict=True,
        ).collect()
    }
    assert out[("a", 10)] is None  # ts=10 build rows no longer eligible
    assert out[("a", 20)] == 300


def test_tolerance_voids_stale_matches(spark):
    probe, build = _frames(spark)
    out = {
        (r.k, r.ts.second): r.q_asof
        for r in asof_join(
            probe, build, on=["k"], right_cols=["q"], right_tiebreak="tb",
            tolerance_seconds=4.0,
        ).collect()
    }
    assert out[("a", 10)] == 200  # age 0s
    assert out[("a", 20)] is None  # best match is 5s old > 4s horizon


def test_payload_fill_is_row_atomic(spark):
    """A null carried value must NOT be back-filled from an older build row."""
    probe = spark.createDataFrame([Row(k="a", ts=_ts(30), pv=1)])
    build = spark.createDataFrame(
        [Row(k="a", ts=_ts(10), q=111, label="old"),
         Row(k="a", ts=_ts(20), q=None, label="new")]
    )
    [r] = asof_join(probe, build, on=["k"], right_cols=["q", "label"]).collect()
    assert r.label_asof == "new"
    assert r.q_asof is None  # from the SAME (newest) row, not torn from old


def test_single_exchange_plan(spark):
    probe, build = _frames(spark)
    plan = asof_join(
        probe, build, on=["k"], right_cols=["q"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_multi_key_join(spark):
    probe = spark.createDataFrame(
        [Row(k1="a", k2=1, ts=_ts(10), pv=1), Row(k1="a", k2=2, ts=_ts(10), pv=2)]
    )
    build = spark.createDataFrame(
        [Row(k1="a", k2=1, ts=_ts(5), q=100), Row(k1="a", k2=2, ts=_ts(6), q=200),
         Row(k1="b", k2=1, ts=_ts(1), q=300)]
    )
    out = {
        (r.k1, r.k2): r.q_asof
        for r in asof_join(probe, build, on=["k1", "k2"], right_cols=["q"]).collect()
    }
    # composite keys must not cross-match
    assert out[("a", 1)] == 100
    assert out[("a", 2)] == 200


def test_hot_key_many_build_rows(spark):
    """10k build rows on one key: the window fill stays correct (the last
    eligible build row wins) — the skew cost model is per-key sort, same
    as any keyed window."""
    probe = spark.createDataFrame(
        [Row(k="hot", ts=_ts(50_000), pv=1), Row(k="hot", ts=_ts(1), pv=2)]
    )
    build = spark.createDataFrame(
        [Row(k="hot", ts=_ts(i), q=i) for i in range(0, 20_000, 2)]
    )
    out = {r.ts.timestamp() % 100_000: r.q_asof for r in asof_join(
        probe, build, on=["k"], right_cols=["q"]).collect()}
    assert out[_ts(50_000).timestamp() % 100_000] == 19_998
    assert out[_ts(1).timestamp() % 100_000] == 0


def test_null_join_keys_never_match(spark):
    """SQL equality (and DuckDB's ASOF JOIN oracle) never matches NULL
    keys — the window partitioning must not group them together."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, "2024-01-01 00:10:00", 1), (1, "2024-01-01 00:10:00", 2)],
        "k long, ts string, probe_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(None, "2024-01-01 00:00:00", 9.0), (1, "2024-01-01 00:00:00", 7.0)],
        "k long, ts string, quote double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.probe_id: r.quote_asof
           for r in asof_join(left, right, on=["k"]).collect()}
    assert got == {1: None, 2: 7.0}  # NULL-key probe kept, never matched
