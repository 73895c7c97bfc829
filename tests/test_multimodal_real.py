"""Golden-byte tests for the REAL multimodal decoders.

``_decode_bmp`` / ``_decode_wav`` parse the public Windows-DIB and
RIFF/WAVE layouts with pure struct/numpy; these tests pin them against
hand-assembled hex payloads (not produced by the sibling encoders), then
round-trip the ``make_bmp``/``make_wav`` encoders through the decoders,
check ``_real_features`` on analytically-known inputs, and drive the
``decoder="real"`` mapInPandas path end to end — including the per-row
``on_error="null"`` tolerance (one corrupt asset must NOT fail the job).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.multimodal import (
    _decode_bmp,
    _decode_wav,
    _real_features,
    extract_media_features,
    make_bmp,
    make_wav,
)

# 1×1 bottom-up 24-bpp BMP, single red pixel RGB(255,0,0) — assembled by
# hand from the spec: 14-byte file header, 40-byte BITMAPINFOHEADER,
# BGR storage, row padded to 4 bytes.
GOLDEN_BMP_1x1_RED = bytes.fromhex(
    "424d3a000000000000003600000028000000"
    "0100000001000000010018000000000004000000"
    "130b0000130b00000000000000000000"
    "0000ff00"
)

# Mono PCM-16 WAV, 8000 Hz, two samples [1000, -1000] — hand-assembled.
GOLDEN_WAV_2SAMPLES = bytes.fromhex(
    "524946462800000057415645"
    "666d74201000000001000100401f0000803e00000200100064617461"
    "04000000"
    "e80318fc"
)


def test_decode_bmp_golden_bytes():
    meta, rgb = _decode_bmp(GOLDEN_BMP_1x1_RED)
    assert meta == {
        "media_type": "image",
        "width": 1,
        "height": 1,
        "n_frames": 1,
        "duration_ms": 0,
    }
    assert rgb.shape == (1, 1, 3)
    assert rgb.tolist() == [[[255, 0, 0]]]


def test_decode_wav_golden_bytes():
    meta, samples = _decode_wav(GOLDEN_WAV_2SAMPLES)
    assert meta == {
        "media_type": "audio",
        "width": 1,  # channels
        "height": None,
        "n_frames": 2,
        "duration_ms": 0,  # round(2 * 1000 / 8000) = 0
    }
    assert samples.tolist() == [[1000], [-1000]]


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip_row_order_and_padding(top_down):
    # 3 wide → 9 pixel bytes/row, padded to 12: exercises the pad path;
    # distinct corner pixels catch any row-order or BGR mix-up.
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    meta, decoded = _decode_bmp(make_bmp(rgb, top_down=top_down))
    assert (meta["width"], meta["height"]) == (3, 2)
    assert np.array_equal(decoded, rgb)


def test_wav_roundtrip_stereo():
    samples = np.array([[100, -100], [2000, 3000], [-32768, 32767]],
                       dtype=np.int16)
    meta, decoded = _decode_wav(make_wav(samples, rate=16000))
    assert meta["width"] == 2
    assert meta["n_frames"] == 3
    assert meta["duration_ms"] == round(3 * 1000 / 16000)
    assert np.array_equal(decoded, samples)


def test_decode_bmp_rejects_malformed():
    with pytest.raises(ValueError):
        _decode_bmp(b"notabmp")
    with pytest.raises(ValueError):
        _decode_bmp(GOLDEN_BMP_1x1_RED[:-2])  # truncated pixel data
    bad_bpp = bytearray(GOLDEN_BMP_1x1_RED)
    bad_bpp[28] = 8  # 8-bpp unsupported
    with pytest.raises(ValueError):
        _decode_bmp(bytes(bad_bpp))


def test_decode_wav_rejects_malformed():
    with pytest.raises(ValueError):
        _decode_wav(b"RIFFxxxxNOPE")
    bad_fmt = bytearray(GOLDEN_WAV_2SAMPLES)
    bad_fmt[20] = 2  # audio_fmt=2 (ADPCM) unsupported
    with pytest.raises(ValueError):
        _decode_wav(bytes(bad_fmt))


def test_real_features_image_histogram():
    # Constant-gray image → all histogram mass in one bin → one-hot.
    rgb = np.full((4, 4, 3), 200, dtype=np.uint8)  # gray 200/255 → bin 6
    meta, arr = _decode_bmp(make_bmp(rgb))
    feats = _real_features(meta, arr, dim=8)
    expected = [0.0] * 8
    expected[int(200 / 255 * 8)] = 1.0
    assert feats == expected
    # Half black / half white → two bins, L2-normalized to 1/sqrt(2).
    rgb2 = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb2[0, :, :] = 255
    meta2, arr2 = _decode_bmp(make_bmp(rgb2))
    feats2 = _real_features(meta2, arr2, dim=8)
    assert feats2[0] == pytest.approx(1 / math.sqrt(2))
    assert feats2[7] == pytest.approx(1 / math.sqrt(2))
    assert sum(1 for f in feats2 if f != 0.0) == 2


def test_real_features_audio_rms():
    # Constant |amplitude| → every segment has the same RMS → each
    # normalized component is exactly 1/sqrt(dim).
    samples = np.full(32, 5000, dtype=np.int16)
    meta, arr = _decode_wav(make_wav(samples))
    feats = _real_features(meta, arr, dim=8)
    assert feats == pytest.approx([1 / math.sqrt(8)] * 8)


def test_decoder_real_spark_end_to_end_with_error_tolerance(spark):
    rgb = np.full((2, 2, 3), 10, dtype=np.uint8)
    rows = [
        (1, make_bmp(rgb)),
        (2, b"corrupt payload"),
        (3, None),
        (4, make_bmp(np.full((3, 1, 3), 255, dtype=np.uint8))),
    ]
    df = spark.createDataFrame(rows, "doc_id int, payload binary")
    out = (
        extract_media_features(df, "payload", media_type="image",
                               decoder="real")
        .select("doc_id", "media_meta.width", "media_meta.height",
                F.element_at("features", 1).alias("f0"))
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.width, r.height) for r in out] == [
        (1, 2, 2), (2, None, None), (3, None, None), (4, 1, 3),
    ]
    assert out[0].f0 == pytest.approx(1.0)  # gray 10/255 → bin 0 one-hot
    assert out[1].f0 is None and out[2].f0 is None

    with pytest.raises(Exception, match="BMP"):
        extract_media_features(df, "payload", media_type="image",
                               decoder="real", on_error="raise").collect()


def test_decoder_real_audio_spark(spark):
    rows = [(1, make_wav(np.full(16, 1000, dtype=np.int16), rate=8000))]
    df = spark.createDataFrame(rows, "doc_id int, payload binary")
    r = extract_media_features(df, "payload", media_type="audio",
                               decoder="real").collect()[0]
    assert r.media_meta.n_frames == 16
    assert r.media_meta.duration_ms == 2
    assert r.features[0] == pytest.approx(1 / math.sqrt(8), rel=1e-6)


def test_media_type_col_per_row_dispatch(spark):
    rows = [
        (1, "image", make_bmp(np.full((2, 2, 3), 10, dtype=np.uint8))),
        (2, "audio", make_wav(np.full(8, 1000, dtype=np.int16))),
        (3, "video", b"anything"),  # unsupported type → null, not task fail
    ]
    df = spark.createDataFrame(rows, "doc_id int, mt string, payload binary")
    out = (
        extract_media_features(df, "payload", decoder="real",
                               media_type_col="mt")
        .select("doc_id", "media_meta.media_type", "media_meta.n_frames")
        .orderBy("doc_id")
        .collect()
    )
    assert [(r.doc_id, r.media_type, r.n_frames) for r in out] == [
        (1, "image", 1), (2, "audio", 8), (3, None, None),
    ]
