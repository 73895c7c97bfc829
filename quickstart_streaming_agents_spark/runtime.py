"""Session-lifetime bookkeeping for driver-side broadcast variables.

Several operators broadcast per-call artifacts (vector_search's
normalized corpus matrix + metadata, pq_adc's ADC lookup tables). A
broadcast cannot be destroyed before its lazy DataFrame materializes,
so the operators REGISTER them here and long-lived callers that run
many queries in one JVM (bench.py runs all 145+) release them between
queries — otherwise every query's artifacts accumulate on driver and
executors for the session's lifetime (ADVICE r8; also the suspected
cause of the r8 embedding_topk_pairs in-sequence drift, VERDICT r8
perf #4: its warm-session runtime matched r7 once state was clean).
"""

from __future__ import annotations

_TRACKED: list = []


def track_broadcast(bc):
    """Register a broadcast for deferred release; returns it."""
    _TRACKED.append(bc)
    return bc


def release_tracked_broadcasts() -> int:
    """Destroy all tracked broadcasts; returns how many. Safe any time
    AFTER the DataFrames they feed have materialized."""
    n = 0
    while _TRACKED:
        bc = _TRACKED.pop()
        try:
            bc.destroy()
            n += 1
        except Exception:  # noqa: BLE001 — already destroyed / ctx gone
            pass
    return n


_TRACKED_PERSISTS: list = []


def track_persist(df):
    """Register a persisted DataFrame for deferred unpersist; returns it.

    Same contract as :func:`track_broadcast`, for executor STORAGE
    memory: an operator that must persist an intermediate so two
    returned lazy frames share one computation (ml_predict_cached's
    new-entry delta — the provider must run once per distinct miss even
    when the caller materializes both frames) cannot unpersist before
    the caller's actions run, so it registers here and long-lived
    callers release between queries.
    """
    _TRACKED_PERSISTS.append(df)
    return df


def persist_scope_mark() -> int:
    """Snapshot the registry length. Pass the returned mark to
    :func:`release_tracked_persists` to release ONLY persists registered
    after the snapshot — the scoping a long-lived caller needs when other
    code in the same session may also be tracking persists (ADVICE r13:
    a blanket release from a streaming pipeline's foreachBatch would
    unpersist a concurrent batch caller's not-yet-materialized delta out
    from under it, voiding its one-provider-call contract via
    recomputation)."""
    return len(_TRACKED_PERSISTS)


def release_tracked_persists(since: int = 0) -> int:
    """Unpersist tracked DataFrames registered at index ``since`` or
    later (default 0 = all); returns how many. Safe any time AFTER the
    frames derived from them have materialized."""
    n = 0
    while len(_TRACKED_PERSISTS) > max(0, since):
        df = _TRACKED_PERSISTS.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — already unpersisted / ctx gone
            pass
    return n
