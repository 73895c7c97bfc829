"""Python DataSource ingest tier (sources/synthetic.py): batch ≡ stream,
determinism, partitioning, and restart-safe offsets."""

from __future__ import annotations

import tempfile

from quickstart_streaming_agents_spark.sources.synthetic import make_doc, register


def _batch(spark, rows, partitions=4):
    register(spark)
    return (
        spark.read.format("syntheticdocs")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def test_batch_rows_deterministic_and_partitioned(spark):
    df = _batch(spark, 200, partitions=7)
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(make_doc(i) for i in range(200))
    assert df.rdd.getNumPartitions() == 7
    # same plan re-read → identical rows (seeded per doc_id)
    assert got == sorted(tuple(r) for r in _batch(spark, 200, 3).collect())


def test_stream_equals_batch(spark):
    register(spark)
    with tempfile.TemporaryDirectory() as ckpt, tempfile.TemporaryDirectory() as out:
        q = (
            spark.readStream.format("syntheticdocs")
            .option("rowsPerBatch", 60)
            .option("maxRows", 150)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        # drain until the offset stops advancing at maxRows
        q.processAllAvailable()
        q.stop()
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == sorted(make_doc(i) for i in range(150))


def test_source_feeds_engine_operators(spark):
    """The generated stream is a drop-in documents table for the curation
    surface — same column contract as the parquet fixture."""
    from quickstart_streaming_agents_spark.functions import text as tx
    from pyspark.sql import functions as F

    df = _batch(spark, 300)
    scored = df.select(
        "doc_id", tx.quality_score("text").alias("q"),
        tx.token_count("text").alias("n")
    )
    assert scored.filter(F.col("n") <= 0).count() == 0
    assert scored.count() == 300


def test_zero_rows_yields_empty_frame(spark):
    """rows=0 must produce an empty DataFrame, not crash (pyspark swaps an
    empty partition list for [None])."""
    df = _batch(spark, 0)
    assert df.count() == 0
