"""Avro OCF block walk: metadata map (incl. the negative-count spec
branch), sync verification, and fault contracts."""

from __future__ import annotations

import pytest

from quickstart_streaming_agents_spark.operators.avro_ocf import (
    MAGIC,
    make_ocf,
    ocf_table,
)
from quickstart_streaming_agents_spark.sources.avro import _write_long

SCHEMA = '{"type":"record","name":"Doc","fields":[{"name":"s","type":"string"}]}'


def _enc(s: str) -> bytes:
    out = bytearray()
    _write_long(out, len(s))
    return bytes(out) + s.encode()


def test_ocf_roundtrip_counts_sizes_and_meta():
    p = make_ocf([[_enc("ab")], [_enc("c"), _enc("ddd")]], SCHEMA,
                 sync=b"\x7f" * 16, extra_meta={"user.k": b"v"})
    t = ocf_table(p)
    assert t["codec"] == "null"
    assert t["schema_name"] == "Doc"
    assert t["n_meta_entries"] == 3
    assert [(b["n_records"], b["byte_size"]) for b in t["blocks"]] == [
        (1, 3), (2, 6)
    ]


def test_ocf_negative_count_metadata_map_branch():
    # hand-build a header whose map uses the negative-count form:
    # count=-2, byte-size, then 2 entries — readers MUST honor it
    out = bytearray(MAGIC)
    entries = bytearray()
    for k, v in ((b"avro.schema", SCHEMA.encode()), (b"avro.codec", b"null")):
        _write_long(entries, len(k))
        entries += k
        _write_long(entries, len(v))
        entries += v
    _write_long(out, -2)
    _write_long(out, len(entries))
    out += entries
    _write_long(out, 0)
    sync = b"\x01" * 16
    out += sync
    _write_long(out, 1)
    payload = _enc("x")
    _write_long(out, len(payload))
    out += payload + sync
    t = ocf_table(bytes(out))
    assert t["n_meta_entries"] == 2
    assert t["schema_name"] == "Doc"
    assert t["blocks"][0]["n_records"] == 1


def test_ocf_sync_mismatch_stops_walk():
    p = bytearray(make_ocf([[_enc("a")], [_enc("b")]], SCHEMA,
                           sync=b"\x05" * 16))
    p[-1] ^= 0xFF  # corrupt final block's sync
    assert len(ocf_table(bytes(p))["blocks"]) == 1


def test_ocf_torn_final_block_keeps_prefix():
    p = make_ocf([[_enc("a")], [_enc("bb")]], SCHEMA)
    assert len(ocf_table(p[:-10])["blocks"]) == 1


def test_ocf_zero_block_file_is_valid():
    t = ocf_table(make_ocf([], SCHEMA, codec="deflate"))
    assert t["blocks"] == []
    assert t["codec"] == "deflate"


def test_ocf_fault_contract():
    with pytest.raises(ValueError):
        ocf_table(b"Obj\x02rest")  # wrong magic version byte
    with pytest.raises(ValueError):
        ocf_table(make_ocf([], SCHEMA)[:9])  # torn metadata
    # unparseable schema JSON degrades to NULL name, walk continues
    t = ocf_table(make_ocf([[_enc("a")]], "{not json"))
    assert t["schema_name"] is None
    assert len(t["blocks"]) == 1


def test_ocf_truncation_at_every_offset_never_raises():
    """ADVICE r11: a final block torn mid-varint made _read_long raise
    IndexError (not ValueError), escaping the walk's fault handler and
    failing the whole job on one bad landing file. Property: truncating
    a well-formed 2-block file at EVERY byte offset past the header
    either parses (prefix blocks only) or — never — raises."""
    p = make_ocf([[_enc("a")], [_enc("bb"), _enc("ccc")]], SCHEMA)
    full = ocf_table(p)
    header_end = len(p) - sum(
        b["byte_size"] for b in full["blocks"]
    ) - 2 * 16 - 4  # rough lower bound; exact cut points swept below
    n_blocks_seen = set()
    for cut in range(max(header_end, len(MAGIC) + 1), len(p)):
        t = ocf_table(p[:cut])  # must not raise for any cut
        assert len(t["blocks"]) <= 2
        n_blocks_seen.add(len(t["blocks"]))
    assert {0, 1} <= n_blocks_seen  # both partial shapes exercised


def test_ocf_trailing_garbage_varint_ends_walk():
    """The exact ADVICE repro: 0x80 appended after the last block is a
    varint with no terminating byte — IndexError territory pre-fix."""
    p = make_ocf([[_enc("a")]], SCHEMA)
    t = ocf_table(p + b"\x80")
    assert len(t["blocks"]) == 1
