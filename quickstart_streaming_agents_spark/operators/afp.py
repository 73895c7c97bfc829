"""Audio energy-signature fingerprinting and near-dup detection.

Beyond-reference surface (SURVEY §M8 multimodal curation): the audio
analog of the dHash image family (operators/phash.py) — re-encoded or
slightly-edited copies of the same recording land on nearby energy
signatures and are caught by banded LSH. All-integer arithmetic, so a
SQL oracle replays every step.

Recipe:

1. decode — the real RIFF/WAVE PCM-16 codec (operators/multimodal),
   channel 0 (no inter-channel averaging: keeps every op integer);
2. the first ``n_windows × window_samples`` samples (zero-padded —
   silence — when shorter) split into fixed windows; per-window ENERGY
   ``E_w = Σ s²`` is an exact BIGINT (int16² · window ≤ 2^39);
3. per-window log-energy bucket ``bit_length(E_w)`` (0 for silence) —
   the exact integer ``floor(log2)+1``, the same no-libm idiom as
   key_skew_histogram's ``length(bin(c))`` buckets;
4. the signature is the bucket sequence; its four QUARTERS are md5'd
   into band digests b0..b3 — the LSH buckets.

Near-dup: pigeonhole — two signatures differing in ≤ ``max_diff ≤ 3``
windows agree on ≥ 1 of the 4 quarter digests (one differing window
perturbs exactly one quarter), so candidates come from one equi-join
on (band index, digest), never all-pairs; the exact differing-window
count (a JVM zip_with fold over the bucket arrays) filters candidates.
100 TB shape: the band shuffle moves a digest + 8 small ints per row;
hot bands (silence-only clips all hashing alike) capped at
``max_bucket`` like the hot-shingle / phash-band caps.

Scale knob (round-9 smoke finding): bit_length buckets span only ~41
values, so a quarter digest over ``n_windows/4`` windows has
``~41^(n_windows/4)`` possible values. The fixture default
``n_windows=8`` (2 windows/quarter, ~1.7k combos) SATURATES the band
space past ~100k clips — every band goes hot and candidate generation
within buckets turns quadratic until ``max_bucket`` starts dropping
them (recall loss). At corpus scale raise ``n_windows`` (32 → 41^8
quarter combos keeps bands sparse at any size); tools/scale_smoke.py
runs the 32-window shape at millions of clips.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def energy_signature_py(samples, window_samples: int, n_windows: int) -> list[int]:
    """Channel-0 int16 samples → per-window bit_length(Σ s²) buckets."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    need = window_samples * n_windows
    if len(s) < need:
        s = np.concatenate([s, np.zeros(need - len(s), dtype=np.int64)])
    s = s[:need].reshape(n_windows, window_samples)
    energies = (s * s).sum(axis=1)
    return [int(e).bit_length() for e in energies]


def _band_digests(sig: list[int]) -> list[str]:
    q = len(sig) // 4
    return [
        hashlib.md5(
            ":".join(str(b) for b in sig[j * q : (j + 1) * q]).encode()
        ).hexdigest()
        for j in range(4)
    ]


def audio_energy_sig(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_samples: int = 256,
    n_windows: int = 8,
    on_error: str = "null",
) -> DataFrame:
    """Per-clip energy signature: ``(id_col, sig, b0..b3)`` where
    ``sig`` is the ':'-joined bucket sequence and b0..b3 the quarter
    digests. NULLs for undecodable payloads under ``on_error="null"``
    (the probe_media contract)."""
    if n_windows % 4:
        raise ValueError("n_windows must be divisible into 4 bands")
    if on_error not in ("null", "raise"):
        raise ValueError(f"on_error must be 'null' or 'raise', got {on_error!r}")

    return df.select(id_col, payload_col).mapInPandas(
        sig_batch_fn(id_col, payload_col, window_samples, n_windows,
                     on_error),
        schema=(f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
                "sig string, b0 string, b1 string, "
                "b2 string, b3 string"),
    )


def sig_batch_fn(
    id_col: str,
    payload_col: str,
    window_samples: int,
    n_windows: int,
    on_error: str,
):
    """The per-batch decode+fingerprint body of ``audio_energy_sig``,
    exposed so a Python payload *producer* (the fixture synths) can be
    composed with it inside ONE ``mapInPandas`` stage — payload bytes
    then never cross the JVM↔Python boundary (guide §4: two chained
    Arrow stages round-trip every clip through the JVM twice)."""
    from quickstart_streaming_agents_spark.operators.multimodal import (
        _decode_mp4_pcm,
        _decode_wav,
    )

    def decode_pcm(p: bytes):
        # container dispatch on magic: RIFF/WAVE, or ISO BMFF whose
        # first track is an uncompressed PCM-16 `sowt`/`twos` entry
        # (r9: the MP4 slice rides the same real sample-table walk) —
        # so one fingerprint pass covers a mixed-container corpus.
        if p[:4] == b"RIFF":
            return _decode_wav(p)
        if len(p) >= 12 and p[4:8] == b"ftyp":
            return _decode_mp4_pcm(p)
        raise ValueError("not a RIFF/WAVE or ISO-BMFF payload")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _, arr = decode_pcm(bytes(payload or b""))
                    sig = energy_signature_py(
                        arr[:, 0], window_samples, n_windows
                    )
                    rows.append(
                        [i, ":".join(map(str, sig)), *_band_digests(sig)]
                    )
                except Exception:
                    if on_error == "raise":
                        raise
                    rows.append([i, None, None, None, None, None])
            yield pd.DataFrame(
                rows, columns=[id_col, "sig", "b0", "b1", "b2", "b3"]
            )

    return compute


def audio_near_dup_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    max_diff: int = 1,
    max_bucket: int = 4096,
) -> DataFrame:
    """Near-duplicate pairs ``(id_a, id_b, n_diff)``, ``id_a < id_b``,
    from banded LSH over ``(id, sig, b0..b3)`` rows. Exact for
    ``max_diff ≤ 3`` (4-band pigeonhole) outside over-``max_bucket``
    bands, which are skipped (bounded fan-out)."""
    return _near_dup_matches(sigs, id_col, max_diff, max_bucket).distinct()


def _near_dup_matches(
    sigs: DataFrame, id_col: str, max_diff: int, max_bucket: int
) -> DataFrame:
    """Pre-distinct near-dup matches ``(id_a, id_b, n_diff)`` — one row
    per MATCHING band collision (a pair sharing k quarter digests
    appears up to k times).

    The ``n_diff`` filter (functionally determined by the pair) runs
    BEFORE any dedup, so downstream distincts shuffle only surviving
    pairs (three narrow columns) instead of every band-join candidate
    dragging both sig strings through an exchange. Callers pick their
    dedup grain: ``audio_near_dup_pairs`` distincts the pair rows,
    ``audio_dedup`` only ever needs distinct ``id_b`` keepers.

    The band self-join is the MEASURED shape: an A/B against the
    single-shuffle group-pair-emission alternative (collect_list per
    (i, v) bucket + nested-transform emission, the ngram_jaccard_pairs
    pattern) timed the grouped form consistently ~65% SLOWER here
    (warm min 4.94 s vs 2.96 s full-query at sf0.1) — the self-join's
    second side reuses the first side's exchange, while the grouped
    form trades that reused exchange for a non-codegen objectified
    collect_list + higher-order pair emission."""
    if not 0 <= max_diff <= 3:
        raise ValueError(
            f"max_diff must be in [0, 3] for 4-band pigeonhole "
            f"exactness, got {max_diff}"
        )
    from .dedup import cap_hot_buckets, explode_bands

    h = sigs.filter(F.col("sig").isNotNull()).select(
        F.col(id_col).alias("item_id"), "sig", "b0", "b1", "b2", "b3"
    )
    bands = cap_hot_buckets(
        explode_bands(h, "item_id", ["b0", "b1", "b2", "b3"],
                      keep_cols=["sig"]),
        max_bucket,
    )
    a = bands.select(
        F.col("item_id").alias("id_a"), "i", "v",
        F.col("sig").alias("sig_a"),
    )
    b = bands.select(
        F.col("item_id").alias("id_b"), "i", "v",
        F.col("sig").alias("sig_b"),
    )
    n_diff = F.aggregate(
        F.zip_with(
            F.split("sig_a", ":"), F.split("sig_b", ":"),
            lambda x, y: F.when(x == y, 0).otherwise(1),
        ),
        F.lit(0), lambda acc, x: acc + x,
    )
    return (
        a.join(b, ["i", "v"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", n_diff.cast("int").alias("n_diff"))
        .filter(F.col("n_diff") <= max_diff)
    )


def audio_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_samples: int = 256,
    n_windows: int = 8,
    max_diff: int = 1,
    max_bucket: int = 4096,
) -> DataFrame:
    """Keep-one-per-near-dup-group over an audio payload column:
    ``(id_col, sig, kept)``; min-id keeper, undecodable clips keep a
    NULL signature and ``kept = true`` (same contract as phash_dedup).

    The signature frame is persisted — three plan branches consume it
    and recomputing re-runs the Python decode (same contract and
    release rule as phash_dedup)."""
    return audio_dedup_from_sigs(
        audio_energy_sig(df, id_col, payload_col, window_samples,
                         n_windows),
        id_col, max_diff, max_bucket,
    )


def audio_dedup_from_sigs(
    sigs_df: DataFrame,
    id_col: str = "doc_id",
    max_diff: int = 1,
    max_bucket: int = 4096,
) -> DataFrame:
    """``audio_dedup`` over an already-fingerprinted ``(id, sig,
    b0..b3)`` frame — the entry point for callers that fuse synthesis
    with fingerprinting in one Python stage. The keeper path dedups
    ``id_b`` directly from the pre-distinct matches: the pair-grain
    ``distinct()`` the pairs API performs would be a second, wider
    exchange feeding the same single-column dedup."""
    sigs = sigs_df.persist()
    dup = (
        _near_dup_matches(sigs, id_col, max_diff, max_bucket)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return sigs.join(dup, id_col, "left").select(
        id_col, "sig",
        (~F.coalesce(F.col("__dup"), F.lit(False))).alias("kept"),
    )
