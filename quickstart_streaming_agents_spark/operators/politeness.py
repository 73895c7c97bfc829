"""Crawl-politeness token bucket — per-host rate limiting as a
DETERMINISTIC integer recurrence, the admission gate in front of every
fetch queue (RFC 9309 robots rules say *what* may be crawled;
politeness decides *when*).

The bucket is classic: capacity ``C`` tokens, refill ``R`` tokens/sec,
one token per request. What makes it an analytics-engine operator
rather than an online limiter is the exactness discipline: tokens live
in integer MILLI-token units, elapsed time in integer milliseconds,
refill is ``Δms·R_mtok div 1000`` — so for a given (host, ts, id)
ordering ANY engine, partitioning, or replay computes bit-identical
admit/deny verdicts. Ordering is (event-time, id) per host —
total and deterministic.

    state per host: (last_ms, mtok);  start: bucket full (C·1000)
    on event:  avail = min(C·1000, mtok + (ms − last_ms)·R_mtok div 1000)
               allowed = avail ≥ 1000;  mtok' = avail − 1000·allowed

This is a clamped recurrence — NOT window-expressible (the min() clamp
breaks prefix-sum form), which is exactly why it earns the per-host
sequential tier: batch = ``applyInPandas`` per host over the sorted
group (Arrow-batched, one shuffle on host); streaming = the
``applyInPandasWithState`` twin in streaming/pipelines.py with ONE
bounded state row per host. The SQL oracle replays the recurrence with
a recursive CTE over per-host row numbers (queries.py) — a rare case
of a custom stateful operator with a full hash oracle.

At 100 TB: hosts are the natural partition key (crawl frontiers are
host-sharded anyway); per-host chains are processed sequentially by
construction — the algorithm's own semantics, not an implementation
shortcut. A pathological single-host corpus is a data-model problem
(one crawl queue), not a shuffle-skew problem to salt away.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def token_bucket_verdicts(
    df: DataFrame,
    host_col: str = "host",
    ts_ms_col: str = "ts_ms",
    id_col: str = "req_id",
    capacity: int = 3,
    refill_mtok_per_sec: int = 500,
) -> DataFrame:
    """Batch token-bucket gate: one row per request with the
    milli-token balance after the event and the admit verdict.
    Output: (host, req_id, ts_ms, mtok_after, allowed)."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if refill_mtok_per_sec < 0:
        raise ValueError("refill_mtok_per_sec must be >= 0")
    cap_m = capacity * 1000

    def gate(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_ms_col, id_col], kind="mergesort")
        mtok = cap_m
        last_ms = None
        out_tok, out_ok = [], []
        for ms in pdf[ts_ms_col]:
            ms = int(ms)
            if last_ms is not None:
                mtok = min(
                    cap_m,
                    mtok + (ms - last_ms) * refill_mtok_per_sec // 1000,
                )
            last_ms = ms
            ok = mtok >= 1000
            if ok:
                mtok -= 1000
            out_tok.append(mtok)
            out_ok.append(ok)
        return pd.DataFrame({
            host_col: pdf[host_col],
            id_col: pdf[id_col],
            ts_ms_col: pdf[ts_ms_col],
            "mtok_after": out_tok,
            "allowed": out_ok,
        })

    host_t = df.schema[host_col].dataType.simpleString()
    id_t = df.schema[id_col].dataType.simpleString()
    # groupBy().applyInPandas IS the one shuffle (hash on host)
    return df.select(host_col, ts_ms_col, id_col).groupBy(host_col).applyInPandas(
        gate,
        schema=(f"{host_col} {host_t}, {id_col} {id_t}, "
                f"{ts_ms_col} long, mtok_after long, allowed boolean"),
    )
