"""ml_detect_anomalies behavior tests on lab3/lab4-shaped synthetic series.

Mirrors the reference's semantic assertions: exactly the surging key is
flagged, and only at the spike (testing/e2e/test_lab3.py:248-257 — anomalies
only for French Quarter; test_lab4.py:265-274 — only Naples).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.anomaly import (
    ml_detect_anomalies,
    norm_ppf,
)


def _series(spark, surge_key="french_quarter", n_windows=120, spike_at=115, spike_mult=6):
    """3 zones × n 5-min windows of steady counts; one zone spikes at the end."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for z, zone in enumerate(["cbd", "uptown", surge_key]):
        for i in range(n_windows):
            # deterministic steady noise ±3 around 50
            count = 50 + ((i * 7 + z * 13) % 7) - 3
            if zone == surge_key and i >= spike_at:
                count *= spike_mult
            rows.append((zone, base + datetime.timedelta(minutes=5 * i), float(count)))
    return spark.createDataFrame(rows, "zone string, window_time timestamp, request_count double")


@pytest.mark.parametrize("detector", ["ar", "zscore"])
def test_only_surging_zone_flagged(spark, detector):
    df = _series(spark)
    out = ml_detect_anomalies(
        df, metric="request_count", ts="window_time", keys=["zone"],
        min_training_size=20, max_training_size=100,
        confidence_percentage=99.9, detector=detector,
    )
    flagged = out.filter("anomaly_result.is_anomaly").collect()
    assert flagged, f"{detector}: no anomalies detected"
    assert {r["zone"] for r in flagged} == {"french_quarter"}
    assert all(r["window_time"] >= datetime.datetime(2024, 1, 1, 9, 35) for r in flagged)


@pytest.mark.parametrize("detector", ["ar", "zscore"])
def test_no_output_before_min_training(spark, detector):
    df = _series(spark)
    out = ml_detect_anomalies(
        df, metric="request_count", ts="window_time", keys=["zone"],
        min_training_size=20, max_training_size=100, detector=detector,
    ).collect()
    for r in out:
        prior = sum(
            1 for q in out if q["zone"] == r["zone"] and q["window_time"] < r["window_time"]
        )
        if prior < 20:
            assert r["anomaly_result"]["forecast_value"] is None
            assert r["anomaly_result"]["is_anomaly"] is False


def test_forecast_tracks_steady_series(spark):
    df = _series(spark, spike_at=10**9)  # no spike
    out = ml_detect_anomalies(
        df, metric="request_count", ts="window_time", keys=["zone"],
        min_training_size=20, max_training_size=100,
        confidence_percentage=99.9, detector="ar",
    ).filter("anomaly_result.forecast_value IS NOT NULL").collect()
    assert out
    for r in out:
        assert abs(r["anomaly_result"]["forecast_value"] - r["request_count"]) < 15
        assert not r["anomaly_result"]["is_anomaly"]


def _collect_results(df):
    rows = df.select("zone", "window_time", "request_count", "anomaly_result").collect()
    return sorted(
        (
            (
                r["zone"],
                r["window_time"],
                r["request_count"],
                r["anomaly_result"]["forecast_value"],
                r["anomaly_result"]["upper_bound"],
                r["anomaly_result"]["lower_bound"],
                r["anomaly_result"]["is_anomaly"],
            )
            for r in rows
        ),
        key=lambda t: (t[0], t[1]),
    )


@pytest.mark.parametrize("chunk_size", [32, 16])
def test_chunked_ar_identical_to_unchunked(spark, chunk_size):
    """A ~500-window key forces many chunks; output must be bit-identical to
    the unchunked path. chunk_size=16 < max_training_size=40 exercises the
    clamp (effective chunk = 40) that keeps the training prefix complete."""
    df = _series(spark, n_windows=500, spike_at=480)
    kwargs = dict(
        metric="request_count", ts="window_time", keys=["zone"],
        min_training_size=20, max_training_size=40,
        confidence_percentage=99.0, detector="ar",
    )
    chunked = _collect_results(ml_detect_anomalies(df, ar_chunk_size=chunk_size, **kwargs))
    unchunked = _collect_results(ml_detect_anomalies(df, ar_chunk_size=None, **kwargs))
    assert len(chunked) == len(unchunked) == 1500
    for c, u in zip(chunked, unchunked):
        assert c == u, f"chunked/unchunked diverge at {c[:2]}: {c} vs {u}"


def test_norm_ppf():
    # textbook quantiles
    assert abs(norm_ppf(0.975) - 1.959964) < 1e-5
    assert abs(norm_ppf(0.5)) < 1e-12
    assert abs(norm_ppf(0.9995) - 3.290527) < 1e-5


def test_null_metric_rows_emit_no_verdict_and_do_not_poison_training(spark):
    """A NULL metric must not occupy a training slot (NaN would poison
    every fit containing it) — scored rows must match the same series
    with the nulls absent."""
    import pandas as pd

    vals = [float(10 + (i % 5)) for i in range(60)]
    rows = [("k", i, vals[i]) for i in range(60)]
    # interleave nulls
    rows += [("k", 1000 + i, None) for i in range(5)]
    df = spark.createDataFrame(rows, "key string, tick long, metric double") \
        .withColumn("ts", F.timestamp_micros(F.col("tick") * 1_000_000))
    out = ml_detect_anomalies(
        df, metric="metric", ts="ts", keys=["key"],
        min_training_size=8, max_training_size=20,
    )
    got = {r.tick: r.anomaly_result for r in out.collect()}
    assert len(got) == 65
    for i in range(5):
        res = got[1000 + i]
        assert res.forecast_value is None and res.is_anomaly is False
    clean = ml_detect_anomalies(
        spark.createDataFrame(
            [("k", i, vals[i]) for i in range(60)],
            "key string, tick long, metric double",
        ).withColumn("ts", F.timestamp_micros(F.col("tick") * 1_000_000)),
        metric="metric", ts="ts", keys=["key"],
        min_training_size=8, max_training_size=20,
    )
    want = {r.tick: r.anomaly_result for r in clean.collect()}
    for i in range(60):
        assert got[i] == want[i], i


def test_chunked_parity_with_tied_timestamps(spark):
    """Tied event times near chunk boundaries must not let the duplicated
    training prefix diverge from the scored tail (both copies now come
    from one evaluated row)."""
    # heavy ties: 3 rows per timestamp; values equal within a tie group so
    # the expected output is order-independent and the assertion is exact
    rows = [("k", i // 3, float((i // 3) % 7)) for i in range(240)]
    df = spark.createDataFrame(rows, "key string, tick long, metric double") \
        .withColumn("ts", F.timestamp_micros(F.col("tick") * 1_000_000))
    kwargs = dict(metric="metric", ts="ts", keys=["key"],
                  min_training_size=8, max_training_size=16)
    def coll(out):
        return sorted(
            (r.key, r.tick, repr(tuple(r.anomaly_result or ())))
            for r in out.select("key", "tick", "anomaly_result").collect()
        )

    a = coll(ml_detect_anomalies(df, ar_chunk_size=16, **kwargs))
    b = coll(ml_detect_anomalies(df, ar_chunk_size=None, **kwargs))
    assert len(a) == len(b) == 240
    assert a == b


def test_rejects_out_of_range_confidence(spark):
    df = spark.createDataFrame([("k", 1, 1.0)], "key string, tick long, metric double") \
        .withColumn("ts", F.timestamp_micros(F.col("tick") * 1_000_000))
    with pytest.raises(ValueError, match="confidence_percentage"):
        ml_detect_anomalies(df, metric="metric", ts="ts", keys=["key"],
                            confidence_percentage=100.0)


def test_rejects_helper_column_collision(spark):
    df = spark.createDataFrame(
        [("k", 1, 1.0, 9)], "key string, tick long, metric double, _ar_rn int"
    ).withColumn("ts", F.timestamp_micros(F.col("tick") * 1_000_000))
    with pytest.raises(ValueError, match="_ar_rn"):
        ml_detect_anomalies(df, metric="metric", ts="ts", keys=["key"]) \
            .collect()


def test_ar2_stability_gate_masks_collinear_windows(spark):
    """Exactly-collinear AR(2) training windows — constant series and
    arithmetic progressions — must be flagged unstable (the two engines'
    solvers legitimately diverge there; anomaly_detect_ar2 masks them to
    NULL on both sides), while a generic noisy series stays stable."""
    import datetime

    from quickstart_streaming_agents_spark.queries import _ar2_stability_gate

    def series(name, vals):
        base = datetime.datetime(2024, 1, 1)
        return [
            (base + datetime.timedelta(hours=6 * i), name, float(v))
            for i, v in enumerate(vals)
        ]

    rows = (
        series("constant", [5] * 12)
        + series("arith_prog", [3 + 2 * i for i in range(12)])
        + series("noisy", [3, 7, 2, 9, 4, 8, 1, 6, 5, 9, 2, 7])
    )
    df = spark.createDataFrame(
        rows, "window_start timestamp, event_type string, m double"
    )
    out = _ar2_stability_gate(df).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append((r.window_start, r["__stable"]))
    for t in ("constant", "arith_prog"):
        scored = [s for _, s in sorted(by_type[t])][8:]
        assert scored and not any(scored), f"{t} windows must be unstable"
    noisy_scored = [s for _, s in sorted(by_type["noisy"])][8:]
    assert noisy_scored and all(noisy_scored), "noisy series must be stable"
