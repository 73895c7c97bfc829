"""Audio energy-signature fingerprinting (operators/afp.py)."""

from __future__ import annotations

import numpy as np
import pytest

from quickstart_streaming_agents_spark.operators.afp import (
    audio_dedup,
    audio_energy_sig,
    audio_near_dup_pairs,
    energy_signature_py,
)
from quickstart_streaming_agents_spark.operators.multimodal import make_wav
from quickstart_streaming_agents_spark.session import ship_package


def test_energy_signature_hand_computed():
    # window 4, 2 windows: [1,1,1,1] -> E=4 -> bit_length 3;
    # [0,0,0,0] -> E=0 -> 0 (silence convention)
    assert energy_signature_py([1, 1, 1, 1, 0, 0, 0, 0], 4, 2) == [3, 0]
    # short input zero-pads: one sample of 3 -> E=9 -> 4, rest silence
    assert energy_signature_py([3], 4, 2) == [4, 0]
    # int16 extremes stay exact BIGINTs: (-32768)^2 * 4 = 2^32
    assert energy_signature_py([-32768] * 4, 4, 1) == [33]


def test_audio_sig_spark_and_error_tolerance(spark):
    ship_package(spark)
    loud = np.full((2048, 1), 1000, np.int16)
    quiet = np.zeros((2048, 1), np.int16)
    rows = [
        (1, bytearray(make_wav(loud, rate=8000))),
        (2, bytearray(make_wav(quiet, rate=8000))),
        (3, b"not a wav"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.sig for r in audio_energy_sig(df).collect()}
    # 1000^2 * 256 = 256e6 -> bit_length 28
    assert got[1] == ":".join(["28"] * 8)
    assert got[2] == ":".join(["0"] * 8)
    assert got[3] is None
    with pytest.raises(Exception):
        audio_energy_sig(df, on_error="raise").collect()
    with pytest.raises(ValueError, match="n_windows"):
        audio_energy_sig(df, n_windows=6)


def test_audio_near_dup_pigeonhole_threshold(spark):
    """Clips differing in 1 window are dups at max_diff=1; in 2
    windows, not; channel 0 only is hashed (stereo right channel is
    ignored by design)."""
    ship_package(spark)
    base = np.repeat(np.int16([100, 200, 300, 400, 500, 600, 700, 800]),
                     256).reshape(-1, 1)
    one = base.copy(); one[:256] = 29000        # window 0 louder
    two = one.copy(); two[256:512] = 29000      # windows 0+1 differ
    stereo = np.hstack([base, np.full_like(base, 31000)])
    rows = [(10, bytearray(make_wav(base, rate=8000))),
            (20, bytearray(make_wav(one, rate=8000))),
            (30, bytearray(make_wav(two, rate=8000))),
            (40, bytearray(make_wav(stereo, rate=8000)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r.kept for r in audio_dedup(df).collect()}
    # 10≡40 exactly (channel 0 equal); 20 is 1 window off 10 -> dup;
    # 30 is 2 off 10 and 1 off 20 -> dup of 20
    assert out == {10: True, 20: False, 30: False, 40: False}

    sigs = audio_energy_sig(df)
    pairs = {(r.id_a, r.id_b): r.n_diff
             for r in audio_near_dup_pairs(sigs, max_diff=2).collect()}
    assert pairs[(10, 40)] == 0
    assert pairs[(10, 20)] == 1
    assert pairs[(20, 30)] == 1
    assert pairs[(10, 30)] == 2  # surfaced at max_diff=2
    with pytest.raises(ValueError, match="max_diff"):
        audio_near_dup_pairs(sigs, max_diff=4)
    # a bucket cap of 1 kills every candidate
    assert audio_near_dup_pairs(sigs, max_bucket=1).count() == 0
