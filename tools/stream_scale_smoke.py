"""Streaming scale smoke: >=1M events through the stateful streaming
operators, recording per-micro-batch throughput and state-store size from
StreamingQuery progress, and ASSERTING state stays bounded (the streaming
analog of tools/scale_smoke.py's batch probe). Not part of CI — a manual
probe for "does the stateful plan hold when the stream grows":

    python tools/stream_scale_smoke.py                  # 1M events, 1M docs
    SMOKE_EVENTS=4000000 SMOKE_DOCS=2000000 python tools/stream_scale_smoke.py

Two pipelines, chosen for opposite state profiles:

  * ml_detect_anomalies_stream — per-KEY ring-buffer state
    (applyInPandasWithState). Bound: state rows == key cardinality,
    regardless of how many events flow through. A growing state row count
    here means keys are leaking.
  * pack_sequences_stream — per-BUCKET scalar state. Bound: state rows ==
    num_buckets (8), the strongest possible bounded-state contract.

Sources are written as N chronological parquet slices and streamed with
maxFilesPerTrigger=1 so the run is genuinely multi-micro-batch (state
crosses batch boundaries, exactly the production shape); sinks are noop
foreachBatch so sink I/O never pollutes the state/throughput figures.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SLICES = 10


def progress_rows(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        d = p if isinstance(p, dict) else json.loads(p.json)
        st = (d.get("stateOperators") or [{}])[0]
        if not d.get("numInputRows") and not st.get("numRowsTotal"):
            continue
        out.append(
            {
                "batch": d["batchId"],
                "rows": d.get("numInputRows", 0),
                "sec": d.get("durationMs", {}).get("triggerExecution", 0) / 1e3,
                "state_rows": st.get("numRowsTotal"),
                "state_mb": round((st.get("memoryUsedBytes") or 0) / 1e6, 2),
            }
        )
    return out


def report(name: str, prog: list[dict], state_bound: int, bound_desc: str,
           drains: bool = False) -> None:
    for p in prog:
        print(
            f"  batch {p['batch']:>3}  rows {p['rows']:>9,}  {p['sec']:7.2f}s"
            f"  state_rows {p['state_rows']}  state_mb {p['state_mb']}"
        )
    rows_total = sum(p["rows"] for p in prog)
    sec_total = sum(p["sec"] for p in prog) or 1e-9
    print(
        f"{name}: {rows_total:,} rows in {sec_total:.1f}s"
        f" = {rows_total / sec_total:,.0f} rows/s over {len(prog)} micro-batches"
    )
    peaks = [p["state_rows"] for p in prog if p["state_rows"] is not None]
    if state_bound == 0:
        # stateless contract: the plan must carry NO state operator at all
        assert not peaks, f"{name}: unexpected state operator: {peaks}"
        print(f"  stateless verified: no state store in any batch "
              f"({bound_desc})\n")
        return
    assert peaks, f"{name}: no state-operator progress recorded"
    assert max(peaks) <= state_bound, (
        f"{name}: state grew past its bound — {max(peaks):,} > {state_bound:,}"
    )
    if drains:
        # watermark-evicted profile: state must SHRINK once the stream
        # settles — a final peak means eviction never fired
        assert peaks[-1] < max(peaks), (
            f"{name}: watermark never evicted: {peaks}"
        )
    else:
        # no unbounded growth: once every key/bucket has been seen (first
        # batch — sources interleave keys round-robin), state must PLATEAU
        assert peaks[-1] == max(peaks), (
            f"{name}: state still growing at end: {peaks}"
        )
    print(f"  state bounded: peak {max(peaks):,} <= {state_bound:,} ({bound_desc})\n")


def write_slices(df, ts_col: str, slice_col, out_dir: str,
                 files: int = 2) -> None:
    """Write SLICES sequential parquet slices (increasing mtime) so the
    file stream replays them as ordered micro-batches — a file-backed
    stand-in for a Kafka topic's chronological partitions. ``files`` =
    files per slice = the micro-batch's scan parallelism (a Kafka topic's
    partition count analog) — map-only stages have no shuffle to re-fan,
    so their per-batch parallelism IS this number."""
    for k in range(SLICES):
        df.filter(slice_col == k).coalesce(files).write.mode("append").parquet(out_dir)
        time.sleep(0.05)  # distinct mtimes => deterministic file order


def smoke_anomaly(spark, events: int, workdir: str) -> None:
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.streaming.ops import (
        ml_detect_anomalies_stream,
    )

    nkeys = 1000
    src = f"{workdir}/events_src"
    per_slice = -(-events // SLICES)
    # JVM-side generation: round-robin keys, strictly increasing event time,
    # deterministic metric wobble; sliced by id (= by time) so the replayed
    # micro-batches are chronological (the ingest contract)
    gen = spark.range(events).select(
        F.concat(F.lit("zone_"), (F.col("id") % nkeys)).alias("zone"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + (F.col("id") / nkeys).cast("long") * 60_000_000
        ).alias("window_time"),
        (50 + ((F.col("id") * 7 + (F.col("id") % nkeys) * 13) % 11)).cast(
            "double"
        ).alias("event_count"),
        F.least(F.lit(SLICES - 1), (F.col("id") / per_slice).cast("int")).alias("slc"),
    )
    write_slices(gen, "window_time", F.col("slc"), src)

    schema = "zone string, window_time timestamp, event_count double"
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "2").load(src)
    )
    scored = ml_detect_anomalies_stream(
        stream, metric="event_count", ts="window_time", keys=["zone"],
        min_training_size=8, max_training_size=50,
    )
    q = (
        scored.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", f"{workdir}/anom_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    report(
        f"ml_detect_anomalies_stream ({events:,} events, {nkeys} keys)",
        progress_rows(q), state_bound=nkeys,
        bound_desc="one ring buffer per key",
    )


def smoke_packing(spark, docs: int, workdir: str) -> None:
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.streaming.ops import pack_sequences_stream

    src = f"{workdir}/docs_src"
    per_slice = -(-docs // SLICES)
    words = ("data stream table window join the of and to in model vector "
             "agent anomaly query plan shuffle state topic schema").split()
    warr = F.array(*[F.lit(w) for w in words])
    gen = spark.range(docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(19) + (F.col("id") % 30).cast("int")),
                lambda i: F.element_at(
                    warr, ((F.col("id") * 31 + i * 7) % len(words) + 1).cast("int")
                ),
            ),
            " ",
        ).alias("text"),
        F.least(F.lit(SLICES - 1), (F.col("id") / per_slice).cast("int")).alias("slc"),
    )
    write_slices(gen, "doc_id", F.col("slc"), src)

    stream = (
        spark.readStream.schema("doc_id long, text string, slc int")
        .format("parquet").option("maxFilesPerTrigger", "2").load(src)
        .select("doc_id", "text")
    )
    packed = pack_sequences_stream(stream, seq_len=256, num_buckets=8)
    q = (
        packed.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", f"{workdir}/pack_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    report(
        f"pack_sequences_stream ({docs:,} docs, 8 buckets)",
        progress_rows(q), state_bound=8,
        bound_desc="one token-offset scalar per bucket",
    )


def smoke_maponly_gates(spark, docs: int, workdir: str) -> None:
    """The r8 stateless-gate tier at scale: ONE fused map-only stage
    chaining classifier scoring, the temperature-mix hash gate, and the
    PCA-style projection arithmetic — zero stateful operators (asserted:
    no state rows in any progress event), so throughput is pure codegen
    and restart is trivial."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.sampling import (
        hash_unit,
        hashed_linear_classifier_score,
    )
    from quickstart_streaming_agents_spark.sources.synthetic import register

    register(spark)
    src = f"{workdir}/gate_src"
    gen = (
        spark.read.format("syntheticdocs")
        .option("rows", docs)
        .option("partitions", spark.sparkContext.defaultParallelism)
        .load()
        .withColumn("slc", F.least(
            F.lit(SLICES - 1),
            (F.col("doc_id") / (-(-docs // SLICES))).cast("int"),
        ))
    )
    # 16 files/slice: a map-only stage's batch parallelism equals its
    # input file count (no shuffle re-fans it) — 2 files would run the
    # fold on 2 of 32 cores and report starvation, not throughput
    write_slices(gen, "doc_id", F.col("slc"), src, files=16)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "16").load(src)
    )
    scored = hashed_linear_classifier_score(
        stream.drop("slc"), text_col="text"
    )
    gated = scored.filter(
        F.col("keep") & (hash_unit(["doc_id"], salt="temp-mix") < 0.5)
    )
    q = (
        gated.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", f"{workdir}/gate_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    prog = progress_rows(q)
    report(
        f"fused map-only gate ({docs:,} docs)",
        prog, state_bound=0,
        bound_desc="stateless — classifier fold + hash gate, no state store",
    )


def smoke_hll_registers(spark, events: int, workdir: str) -> None:
    """Round-9 sketch tier: streaming HyperLogLog registers (update-mode
    max(rank) aggregate, operators/hll.py). THE bounded-state showcase —
    state rows are capped at strata × 2^p (5 × 256 = 1,280) no matter
    how many distinct values flow through; a cardinality-tracking job
    whose state grew with cardinality would defeat the sketch's whole
    point, so the bound is asserted, not hoped."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.hll import hll_registers
    from quickstart_streaming_agents_spark.sources.synthetic import register

    register(spark)
    src = f"{workdir}/hll_src"
    gen = (
        spark.read.format("syntheticdocs")
        .option("rows", events)
        .option("partitions", spark.sparkContext.defaultParallelism)
        .load()
        .select(
            F.concat(F.lit("type"), (F.col("doc_id") % 5).cast("string"))
            .alias("event_type"),
            F.col("doc_id").cast("string").alias("v"),  # all-distinct ids
            F.col("doc_id"),
        )
        .withColumn("slc", F.least(
            F.lit(SLICES - 1),
            (F.col("doc_id") / (-(-events // SLICES))).cast("int"),
        ))
    )
    write_slices(gen, "doc_id", F.col("slc"), src, files=16)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "16").load(src)
    )
    regs = hll_registers(stream.drop("slc", "doc_id"), "v",
                         strata=["event_type"], p=8)
    q = (
        regs.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", f"{workdir}/hll_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    prog = progress_rows(q)
    report(
        f"hll registers ({events:,} distinct values)",
        prog, state_bound=5 * 256,
        bound_desc="strata × 2^p registers — cardinality-independent",
    )


def smoke_kmins_registers(spark, events: int, workdir: str) -> None:
    """Round-10 sketch tier: streaming k-mins bottom-hash registers
    (update-mode min(h) aggregate, operators/kmv.py). Same bounded-state
    contract as the HLL twin — state rows capped at strata × k no
    matter how many distinct values flow."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.kmv import (
        kmins_signature,
    )
    from quickstart_streaming_agents_spark.sources.synthetic import register

    register(spark)
    src = f"{workdir}/kmins_src"
    gen = (
        spark.read.format("syntheticdocs")
        .option("rows", events)
        .option("partitions", spark.sparkContext.defaultParallelism)
        .load()
        .select(
            F.concat(F.lit("type"), (F.col("doc_id") % 5).cast("string"))
            .alias("event_type"),
            F.col("doc_id").cast("string").alias("v"),
            F.col("doc_id"),
        )
        .withColumn("slc", F.least(
            F.lit(SLICES - 1),
            (F.col("doc_id") / (-(-events // SLICES))).cast("int"),
        ))
    )
    write_slices(gen, "doc_id", F.col("slc"), src, files=16)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "16").load(src)
    )
    sig = kmins_signature(stream.drop("slc", "doc_id"), "v",
                          strata=["event_type"], k=64)
    q = (
        sig.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", f"{workdir}/kmins_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    prog = progress_rows(q)
    report(
        f"kmins registers ({events:,} distinct values)",
        prog, state_bound=5 * 64,
        bound_desc="strata × k registers — cardinality-independent",
    )


def smoke_contamination_fraction(spark, docs: int, workdir: str) -> None:
    """Round-10 graded contamination stream: broadcast benchmark set,
    per-doc agg with event time in the grouping key. State rows track
    in-flight docs per micro-batch (watermark-evicted), bounded by the
    docs per batch — asserted against the slice size."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.decontamination import (
        _norm_shingles,
    )
    from quickstart_streaming_agents_spark.sources.synthetic import register

    register(spark)
    src = f"{workdir}/cfrac_src"
    gen = (
        spark.read.format("syntheticdocs")
        .option("rows", docs)
        .option("partitions", spark.sparkContext.defaultParallelism)
        .load()
        .select(
            "doc_id", "text",
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("doc_id") * 1_000
            ).alias("ts"),
        )
        .withColumn("slc", F.least(
            F.lit(SLICES - 1),
            (F.col("doc_id") / (-(-docs // SLICES))).cast("int"),
        ))
    )
    write_slices(gen, "doc_id", F.col("slc"), src, files=16)

    bench = (
        _norm_shingles(
            spark.read.parquet(src).filter(F.col("doc_id") % 1009 == 0)
            .select(F.lit(0).alias("__bid"), F.col("text").alias("__btext")),
            "__bid", "__btext", 8,
        )
        .select(F.xxhash64("shingle").alias("h")).distinct()
        .withColumn("__m", F.lit(1))
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "16").load(src)
        .withWatermark("ts", "1 second")
    )
    shingled = _norm_shingles(
        stream, "doc_id", "text", 8, keep_cols=["ts"]
    ).select("doc_id", "ts", F.xxhash64("shingle").alias("h"))
    per = (
        shingled.join(F.broadcast(bench), "h", "left")
        .groupBy("doc_id", "ts")
        .agg(F.count("*").alias("n_ngrams"), F.count("__m").alias("n_hits"))
    )
    q = (
        per.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", f"{workdir}/cfrac_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    prog = progress_rows(q)
    # the watermark evicts settled docs each batch, so in-flight state
    # is bounded by ~2 micro-batches of docs (current + not-yet-evicted
    # previous), NOT the corpus — the bound that matters at 100 TB
    max_batch = max((p["rows"] for p in prog), default=0)
    report(
        f"graded contamination ({docs:,} docs)",
        prog, state_bound=2 * max_batch,
        bound_desc="in-flight docs (watermark-evicted; <= 2 micro-batches)",
        drains=True,
    )


def smoke_crawl_frontier(spark, docs: int, workdir: str) -> None:
    """Round-11 robots-gate stream: static broadcast rules (997 hosts),
    per-URL min(struct) verdict with event time in the grouping key.
    Same state profile as the contamination stream — in-flight URLs per
    micro-batch, watermark-evicted."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.web import (
        robots_rules_table,
    )
    from quickstart_streaming_agents_spark.sources.synthetic import register

    register(spark)
    src = f"{workdir}/frontier_src"
    gen = (
        spark.read.format("syntheticdocs")
        .option("rows", docs)
        .option("partitions", spark.sparkContext.defaultParallelism)
        .load()
        .select(
            "doc_id",
            F.concat(F.lit("h"), F.col("doc_id") % 997,
                     F.lit(".example.com")).alias("host"),
            F.concat(F.lit("/p/"), F.col("doc_id") % 13,
                     F.when(F.col("doc_id") % 2 == 0, F.lit("/pub/x"))
                     .otherwise(F.lit("/y"))).alias("path"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("doc_id") * 1_000
            ).alias("ts"),
        )
        .withColumn("slc", F.least(
            F.lit(SLICES - 1),
            (F.col("doc_id") / (-(-docs // SLICES))).cast("int"),
        ))
    )
    write_slices(gen, "doc_id", F.col("slc"), src, files=16)

    bodies = spark.createDataFrame(
        [(f"h{i}.example.com",
          f"User-agent: *\nDisallow: /p/{i % 4}\n"
          f"Allow: /p/{i % 4}/pub\n") for i in range(997)],
        "host string, robots_txt string",
    )
    rules = robots_rules_table(bodies).select(
        F.col("host").alias("__rhost"),
        F.col("prefix").alias("__prefix"),
        F.col("allow").alias("__allow"),
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "16").load(src)
        .withWatermark("ts", "1 second")
    )
    j = stream.join(
        F.broadcast(rules), stream["host"] == F.col("__rhost"), "left"
    ).withColumn(
        "__m",
        F.col("__prefix").isNotNull()
        & F.col("path").startswith(F.col("__prefix")),
    )
    per = (
        j.groupBy("doc_id", "host", "path", "ts")
        .agg(F.min(F.struct(
            (1 - F.col("__m").cast("int")).alias("k1"),
            (-F.coalesce(F.length("__prefix"), F.lit(0))).alias("k2"),
            (1 - F.coalesce(F.col("__allow"), F.lit(False)).cast("int"))
            .alias("k3"),
            F.col("__prefix").alias("k4"),
            F.col("__m").alias("m"),
            F.col("__allow").alias("allow"),
        )).alias("__p"))
    )
    q = (
        per.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, _: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", f"{workdir}/frontier_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    prog = progress_rows(q)
    max_batch = max((p["rows"] for p in prog), default=0)
    report(
        f"crawl frontier gate ({docs:,} urls)",
        prog, state_bound=2 * max_batch,
        bound_desc="in-flight urls (watermark-evicted; <= 2 micro-batches)",
        drains=True,
    )


def smoke_token_bucket(spark, events: int, workdir: str) -> None:
    """Round-11b politeness gate: per-host state is TWO scalars — the
    tightest bounded-state contract in the engine (state rows == host
    cardinality, bytes O(hosts), independent of event volume)."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.streaming.ops import (
        token_bucket_gate_stream,
    )

    nhosts = 1000
    src = f"{workdir}/tb_src"
    per_slice = -(-events // SLICES)
    # round-robin hosts, strictly increasing ms, deterministic jitter so
    # both verdicts fire (bursts within a host beat the refill rate)
    gen = spark.range(events).select(
        F.concat(F.lit("h"), (F.col("id") % nhosts)).alias("host"),
        F.col("id").alias("req_id"),
        (F.lit(1_700_000_000_000)
         + (F.col("id") / nhosts).cast("long") * 700
         + (F.col("id") % 7) * 13).alias("ts_ms"),
        F.least(F.lit(SLICES - 1),
                (F.col("id") / per_slice).cast("int")).alias("slc"),
    )
    write_slices(gen, "ts_ms", F.col("slc"), src)

    schema = "host string, req_id long, ts_ms long"
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "2").load(src)
    )
    gated = token_bucket_gate_stream(
        stream, host_col="host", ts_ms_col="ts_ms", id_col="req_id",
        capacity=3, refill_mtok_per_sec=500,
    )
    q = (
        gated.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", f"{workdir}/tb_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    report(
        f"token_bucket_gate_stream ({events:,} requests, {nhosts} hosts)",
        progress_rows(q), state_bound=nhosts,
        bound_desc="two scalars per host",
    )


def smoke_preference_pairs(spark, docs: int, workdir: str) -> None:
    """Round-12 twin: DPO pair state is TWO packed BIGINTs per prompt
    (best/worst of rating*1e8+doc) — same bounded-state class as the
    token bucket, and order-insensitive (min/max), so no ingest-order
    contract at all."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.streaming.ops import (
        preference_pairs_stream,
    )

    nprompts = 10_000
    src = f"{workdir}/pp_src"
    per_slice = -(-docs // SLICES)
    gen = spark.range(docs).select(
        (F.col("id") % nprompts).alias("prompt_id"),
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("rating"),
        F.least(F.lit(SLICES - 1),
                (F.col("id") / per_slice).cast("int")).alias("slc"),
    )
    write_slices(gen, "doc_id", F.col("slc"), src)

    schema = "prompt_id long, doc_id long, rating long"
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("maxFilesPerTrigger", "2").load(src)
    )
    paired = preference_pairs_stream(stream)
    q = (
        paired.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, _: df.write.format("noop").mode("overwrite").save()
        )
        .option("checkpointLocation", f"{workdir}/pp_ckpt")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    report(
        f"preference_pairs_stream ({docs:,} ratings, {nprompts:,} prompts)",
        progress_rows(q), state_bound=nprompts,
        bound_desc="two packed BIGINTs per prompt",
    )


def main() -> None:
    events = int(os.environ.get("SMOKE_EVENTS", 1_000_000))
    docs = int(os.environ.get("SMOKE_DOCS", 1_000_000))

    from quickstart_streaming_agents_spark.session import get_spark, ship_package

    spark = get_spark("stream_scale_smoke")
    ship_package(spark)
    workdir = tempfile.mkdtemp(prefix="stream_smoke_")
    t0 = time.perf_counter()
    only = os.environ.get("SMOKE_ONLY")  # substring over smoke fn names

    def run(fn, n):
        if only and only not in fn.__name__:
            return
        fn(spark, n, workdir)

    try:
        run(smoke_anomaly, events)
        run(smoke_packing, docs)
        run(smoke_maponly_gates, docs)
        run(smoke_hll_registers, events)
        run(smoke_kmins_registers, events)
        run(smoke_contamination_fraction, docs)
        run(smoke_crawl_frontier, docs)
        run(smoke_token_bucket, events)
        run(smoke_preference_pairs, docs)
        print(f"total wall: {time.perf_counter() - t0:.1f}s")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
