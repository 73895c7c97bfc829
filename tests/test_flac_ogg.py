"""FLAC metadata walk + Ogg page demux: bit-boundary, CRC, and fault
contracts (the operators' queries.py entries prove parity; these pin
the byte-level behaviors the analytic oracles can't see)."""

from __future__ import annotations

import hashlib

import pytest

from quickstart_streaming_agents_spark.operators.flac import (
    flac_stream_table,
    make_flac,
)
from quickstart_streaming_agents_spark.operators.ogg import (
    make_ogg_page,
    ogg_crc,
    ogg_page_table,
)


# --- FLAC -----------------------------------------------------------------

def test_flac_streaminfo_field_width_extremes():
    # max-width values: rate 2^20-1, 8 channels, 32 bps, 2^36-1 samples
    t = flac_stream_table(make_flac((1 << 20) - 1, 8, 32, (1 << 36) - 1))
    assert t["sample_rate"] == (1 << 20) - 1
    assert t["channels"] == 8
    assert t["bits_per_sample"] == 32
    assert t["total_samples"] == (1 << 36) - 1


def test_flac_bit_pack_no_field_bleed():
    # adjacent-field bleed check: minimal values in every field
    t = flac_stream_table(make_flac(1, 1, 4, 0))
    assert (t["sample_rate"], t["channels"],
            t["bits_per_sample"], t["total_samples"]) == (1, 1, 4, 0)


def test_flac_md5_and_duration():
    sig = hashlib.md5(b"audio").digest()
    t = flac_stream_table(make_flac(8000, 1, 16, 12345, audio_md5=sig))
    assert t["audio_md5"] == sig.hex()
    assert t["duration_ms"] == 12345 * 1000 // 8000


def test_flac_walk_stops_at_last_block_flag():
    # frame junk that LOOKS like a block header must never be walked
    p = make_flac(8000, 1, 16, 10, frame_junk=b"\x84\x00\x00\xffgarbage")
    t = flac_stream_table(p)
    assert t["n_meta_blocks"] == 1


def test_flac_title_extraction_and_missing_title():
    t = flac_stream_table(make_flac(8000, 1, 16, 1, tags={"TITLE": "x=y"}))
    assert t["title"] == "x=y"  # '=' in value survives the 1-split
    t2 = flac_stream_table(make_flac(8000, 1, 16, 1, tags={"ARTIST": "a"}))
    assert t2["has_vorbis_comment"] and t2["title"] is None


def test_flac_fault_contract():
    with pytest.raises(ValueError):
        flac_stream_table(b"not flac")
    with pytest.raises(ValueError):
        flac_stream_table(b"fLaC\x04\x00\x00\x08" + b"\x00" * 8)  # VC first
    # torn TAG body after a good STREAMINFO: identity survives
    good = make_flac(8000, 2, 16, 99, tags={"TITLE": "t"})
    assert flac_stream_table(good[:-3])["sample_rate"] == 8000
    # torn STREAMINFO raises
    with pytest.raises(ValueError):
        flac_stream_table(good[:20])


# --- Ogg ------------------------------------------------------------------

def test_ogg_crc_reference_vector():
    # independent property: CRC of single zero byte under the RFC 3533
    # parameters equals the raw table entry for 0x00 shifted through
    assert ogg_crc(b"\x00") == 0
    assert ogg_crc(b"\x01") == 0x04C11DB7


def test_ogg_multi_segment_packet_lacing():
    # 300-byte packet → lacing [255, 45]; 255-byte → [255, 0]
    page = make_ogg_page([b"a" * 300, b"b" * 255], 5, 1, 0)
    (r,) = ogg_page_table(page)
    assert r["n_segments"] == 4
    assert r["n_packets"] == 2
    assert r["payload_length"] == 555


def test_ogg_page_fields_roundtrip():
    p1 = make_ogg_page([b"x"], granule=-1, serial=7, seq=0, bos=True)
    p2 = make_ogg_page([b"y"], granule=9, serial=7, seq=1, eos=True)
    rows = ogg_page_table(p1 + p2)
    assert [r["page_seq"] for r in rows] == [0, 1]
    assert rows[0]["granule"] == -1  # -1 = "no packet ends here" sentinel
    assert rows[0]["is_bos"] and rows[1]["is_eos"]
    assert rows[1]["offset"] == len(p1)
    assert rows[0]["payload_md5"] == hashlib.md5(b"x").hexdigest()


def test_ogg_crc_actually_verified():
    page = bytearray(make_ogg_page([b"payload"], 1, 2, 0))
    page[-1] ^= 0x01  # flip a payload bit; header still parses
    with pytest.raises(ValueError, match="CRC"):
        ogg_page_table(bytes(page))


def test_ogg_fault_contract():
    with pytest.raises(ValueError):
        ogg_page_table(b"not ogg at all")
    good = make_ogg_page([b"k" * 40], 1, 2, 0)
    # torn second page: first survives
    assert len(ogg_page_table(good + good[:11])) == 1
    # corrupt second page CRC: first survives
    bad = bytearray(good)
    bad[30] ^= 1
    assert len(ogg_page_table(good + bytes(bad))) == 1


def test_ogg_too_many_lacing_slots_rejected_at_synth():
    with pytest.raises(ValueError):
        make_ogg_page([b"z" * 255] * 256, 0, 0, 0)
