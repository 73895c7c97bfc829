"""Multimodal (image/audio/video) column plumbing.

Beyond-reference surface: opaque ``binary`` payload columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` decoders. The real
decoders (Pillow/librosa/ffmpeg) are NOT in this container — the decode
step is stubbed behind ``decoder="fake"`` (deterministic md5-derived
features) or raises ``NotImplementedError`` for ``decoder="real"``. The
Spark-side contract — schema, batch shape, partitioning, UDF signature —
is real and tested; swapping in a real decoder touches one function.

At 100 TB: binaries live in parquet/object storage; ``mapInPandas``
streams record batches so one oversized asset can't OOM an executor
(cap via spark.sql.execution.arrow.maxRecordsPerBatch and
spark.sql.files.maxPartitionBytes).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_payload(df: DataFrame, source_col: str, payload_col: str = "payload") -> DataFrame:
    """Fixture stand-in: derive a binary payload column (real pipelines read
    bytes from object storage / parquet binary columns)."""
    return df.withColumn(payload_col, F.encode(F.col(source_col), "UTF-8"))


def _fake_decode(payload: bytes, media_type: str) -> dict:
    h = hashlib.md5(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if media_type == "image" else 1 + h[2] % 120
    return {
        "media_type": media_type,
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "duration_ms": int(n_frames * (33 if media_type == "video" else 0)),
    }


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic unit feature vector from per-dimension md5s.

    Same SQL-replayable construction as providers.fake_embedding: component
    i is md5(md5(payload).hex + '#' + i) → uint64 → [-1, 1), then L2
    normalization in sequential float64 — DuckDB reproduces it bit-for-bit
    (``md5(md5(text) || '#' || i)``), which is what lets the
    multimodal_features query be hash-checked end to end.
    """
    seed_hex = hashlib.md5(payload or b"").hexdigest()
    u = [
        int(hashlib.md5(f"{seed_hex}#{i}".encode()).hexdigest()[:16], 16)
        / 2**64 * 2.0 - 1.0
        for i in range(dim)
    ]
    s = 0.0
    for x in u:
        s += x * x
    n = math.sqrt(s) or 1.0
    return [x / n for x in u]


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    media_type: str = "image",
    feature_dim: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Append ``media_meta`` struct + ``features`` array<float>.

    ``decoder="real"`` is the integration point for actual image/audio
    libraries; it raises until those are available in the runtime.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this runtime; use decoder='fake' for plumbing tests"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("media_meta", MEDIA_META_TYPE),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )
    in_cols = df.columns

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].tolist()
            out = pdf[in_cols].copy()
            out["media_meta"] = [_fake_decode(p, media_type) for p in payloads]
            out["features"] = [_fake_features(p, feature_dim) for p in payloads]
            yield out

    return df.mapInPandas(decode, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_nth: int = 30,
    decoder: str = "fake",
) -> DataFrame:
    """Video → one row per sampled frame (frame_idx, frame_payload).

    Fake decoder derives per-frame payloads deterministically; the real one
    would emit decoded frame bytes. Demonstrates the 1→N mapInPandas shape.
    """
    if decoder != "fake":
        raise NotImplementedError("real frame sampling requires ffmpeg-class deps")
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )
    in_cols = df.columns

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                payload = pdf[payload_col].iloc[i] or b""
                meta = _fake_decode(payload, "video")
                for fi in range(0, meta["n_frames"], every_nth):
                    rows.append(
                        {**{c: pdf[c].iloc[i] for c in in_cols},
                         "frame_idx": fi,
                         "frame_payload": hashlib.md5(payload + str(fi).encode()).digest()}
                    )
            yield pd.DataFrame(rows, columns=in_cols + ["frame_idx", "frame_payload"])

    return df.mapInPandas(sample, schema=out_schema)
