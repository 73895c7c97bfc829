"""Kafka topic sources/sinks (S1/S2) with schema-bearing message serde.

The reference declares every topic as an Avro-backed table via DDL
(terraform/lab1-tool-calling/main.tf:233-241 in /root/reference) and
produces keyed messages (scripts/lab4_datagen.py:240-246). Spark-side, a
topic read is::

    spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", ...).option("subscribe", topic)
    → value: binary → decode(schema) → typed columns + watermark

This container ships no spark-sql-kafka connector jar and no broker, so the
``format("kafka")`` paths are gated on :func:`kafka_available`; the serde —
the engine-owned part — is real and tested hermetically:

- JSON serde (default): ``to_json(struct(*))`` / ``from_json(value, schema)``
  — schema declared per topic exactly like the reference's Schema-Registry
  contract, just a different wire encoding.
- Avro serde (``serde="avro"``): Confluent wire format (magic byte +
  schema id + Avro binary body) via the pure-Python codec in :mod:`.avro`;
  on a cluster with spark-avro on the classpath, swap the pandas-UDF codec
  for JVM ``from_avro``/``to_avro`` behind :func:`avro_available`.

Scale note: one Spark partition per Kafka partition; ``minPartitions`` can
fan a hot topic wider. Keyed writes preserve per-key ordering — the
reference relies on this for its single-partition global ordering
(scripts/publish_lab3_data.py:316); at 100 TB you key by entity and give
the topic hundreds of partitions instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka data source is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def avro_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# serde: rows ⇄ (key, value) wire messages
# ---------------------------------------------------------------------------

# Default JSON timestamp format keeps only milliseconds; the reference's
# Avro schemas are timestamp-millis too (scripts/lab4_datagen.py:121), but
# our parquet fixtures carry microseconds — preserve them on the wire.
_TS_FMT = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def encode_json(df: DataFrame, key: str | None = None) -> DataFrame:
    """Rows → Kafka-shaped (key STRING, value STRING) messages.

    ``key`` names the column used as the message key (ST5's PRIMARY KEY →
    message-key mapping); None sends null keys (round-robin partitioning).
    """
    value = F.to_json(F.struct(*[F.col(c) for c in df.columns]), _TS_FMT)
    k: Column = F.col(key).cast("string") if key else F.lit(None).cast("string")
    return df.select(k.alias("key"), value.alias("value"))


def decode_json(msgs: DataFrame, schema: T.StructType,
                ts_col: str | None = None,
                watermark: str | None = None) -> DataFrame:
    """(key, value) messages → typed rows via the declared topic schema.

    Mirrors the reference's DDL contract: fields absent from the message
    come back null; extra message fields are dropped (Schema Registry
    compatibility semantics, reader's-schema wins).
    """
    out = msgs.select(
        F.from_json(F.col("value").cast("string"), schema, _TS_FMT).alias("r")
    ).select("r.*")
    if ts_col is not None and watermark is not None:
        out = out.withWatermark(ts_col, watermark)
    return out


# ---------------------------------------------------------------------------
# topic read/write (gated on connector availability)
# ---------------------------------------------------------------------------

def read_topic(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    schema: T.StructType,
    ts_col: str | None = None,
    watermark: str | None = None,
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
    serde: str = "json",
    schema_id: int = 1,
    ts_logical: str = "micros",
) -> DataFrame:
    """S1: subscribe to a topic as a streaming DataFrame of typed rows."""
    if not kafka_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on classpath; use "
            "StreamCatalog's file-backed topics locally"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    if serde == "avro":
        from quickstart_streaming_agents_spark.sources.avro import decode_avro

        # schema_id must match the registry-assigned id for the topic —
        # the default 1 only suits the hermetic round-trip tests
        return decode_avro(
            reader.load(), schema, schema_id=schema_id,
            ts_logical=ts_logical, ts_col=ts_col, watermark=watermark,
        )
    return decode_json(reader.load(), schema, ts_col, watermark)


def write_topic(
    df: DataFrame,
    bootstrap: str,
    topic: str,
    checkpoint: str,
    key: str | None = None,
    mode: str = "append",
    serde: str = "json",
    schema_id: int = 1,
    ts_logical: str = "micros",
):
    """S2: continuous insert into a topic (CTAS sink half). Returns the
    started StreamingQuery."""
    if not kafka_available(df.sparkSession):
        raise RuntimeError("spark-sql-kafka connector not on classpath")
    if serde == "avro":
        from quickstart_streaming_agents_spark.sources.avro import encode_avro

        msgs = encode_avro(df, key=key, schema_id=schema_id, ts_logical=ts_logical)
    else:
        msgs = encode_json(df, key=key)
    return (
        msgs.writeStream.format("kafka")
        .outputMode(mode)
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
