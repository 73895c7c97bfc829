"""Hermetic tests for the Kafka message serde (connector itself is gated on
classpath availability and absent in this container)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from quickstart_streaming_agents_spark.sources.kafka import (
    decode_json,
    encode_json,
    kafka_available,
)
from quickstart_streaming_agents_spark.sources.parquet import load_table

from .conftest import SF_DIR


def test_json_roundtrip_preserves_rows(spark):
    events = load_table(spark, SF_DIR, "events").limit(200)
    msgs = encode_json(events, key="event_id")
    assert msgs.columns == ["key", "value"]
    back = decode_json(msgs, events.schema)
    a = sorted(tuple(r) for r in events.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_decode_reader_schema_wins(spark):
    msgs = spark.createDataFrame(
        [("1", '{"a": 1, "extra": "x"}'), ("2", '{"a": 2}')], ["key", "value"]
    )
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("missing", T.StringType()),
    ])
    rows = decode_json(msgs, schema).orderBy("a").collect()
    assert [r.a for r in rows] == [1, 2]
    assert all(r.missing is None for r in rows)  # absent field → null
    assert "extra" not in decode_json(msgs, schema).columns  # dropped


def test_null_key_mode(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    msgs = encode_json(df)  # no key column → null keys (round-robin)
    assert msgs.collect()[0].key is None


def test_connector_gate_reports_absence(spark):
    # this container has no spark-sql-kafka jar; the gate must say so
    # (and on a cluster that has it, read/write_topic work unchanged)
    assert kafka_available(spark) is False


def test_watermark_applied_in_decode(spark):
    events = load_table(spark, SF_DIR, "events").limit(10)
    msgs = encode_json(events, key="event_id")
    out = decode_json(msgs, events.schema, ts_col="ts", watermark="5 seconds")
    # batch evaluation ignores the watermark but the plan must still build
    # and keep the typed columns
    assert out.columns == events.columns
    assert out.count() == 10
