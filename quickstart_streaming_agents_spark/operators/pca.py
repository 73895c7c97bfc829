"""Distributed PCA over embedding columns (beyond-reference surface).

The standard dimensionality-reduction step in front of clustering /
ANN / SemDeDup-style pipelines (Abbas et al. 2023 operate on reduced
embeddings; IVF indexes routinely train on PCA-compressed vectors).

Scale shape — the classic single-pass moment decomposition:

1. **Moments**: one ``mapInPandas`` scan emits, per Arrow record batch,
   a single row ``[n, Σx (d), Σxxᵀ (d·d)]`` computed by BLAS
   (``X.T @ X``) — the only place Python touches the data, and it
   touches it once, vectorized. No per-row work survives the batch.
2. **Combine**: the per-batch moment rows (one per Arrow batch — a few
   per partition) are summed elementwise with posexplode → groupBy(i)
   — a shuffle of ``(1+d+d²) × partitions`` TINY rows with map-side
   partial aggregation, then a ``1+d+d²``-row driver collect (~33 KB
   at d=64). Fully distributed at any corpus size; the driver never
   sees a vector, only the moment sums.
3. **Eigh**: covariance ``(M − n·μμᵀ)/(n−1)`` is d×d on the driver;
   ``numpy.linalg.eigh`` (symmetric, deterministic), components
   sign-normalized so the largest-|loading| coordinate is positive —
   run/platform-stable output.
4. **Project**: components ship to executors as array literals inside
   the plan; each output coordinate is a JVM ``zip_with``+``aggregate``
   fold — the projection pass is map-only, zero Python, zero shuffle.

No SQL oracle is possible (eigendecomposition), so the driver records a
rows-only check; numerical correctness is pinned by
``tests/test_pca.py`` against an independent full-matrix NumPy PCA.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(
    df: DataFrame, vec_col: str, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA on ``df[vec_col]`` (array<float/double>, fixed dim).

    Returns ``(mean (d,), components (d, k), eigenvalues (k,))``,
    eigenvalues descending. See module docstring for the plan shape.
    """
    # NULL-embedding contract shared with ann_ivf/ann_lsh/pq_adc
    # (commit d10f326): dirty rows are dropped, they don't poison the
    # fit — and dimensionality must not depend on the scan order
    # putting a NULL first.
    df = df.filter(F.col(vec_col).isNotNull())
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("pca_fit: need >= 2 vectors, got 0")
    d = len(first[0])
    if not (1 <= k <= d):
        raise ValueError(f"pca_fit: need 1 <= k <= dim, got k={k}, dim={d}")

    def batch_moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [v for v in pdf.iloc[:, 0] if v is not None]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            if x.shape[1] != d:
                raise ValueError(
                    f"pca_fit: ragged embedding dim {x.shape[1]} != {d}"
                )
            v = np.concatenate(
                [[float(len(x))], x.sum(axis=0), (x.T @ x).ravel()]
            )
            yield pd.DataFrame({"v": [v.tolist()]})

    moments = df.select(vec_col).mapInPandas(
        batch_moments, schema="v array<double>"
    )
    summed = (
        moments.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("x"))
        .collect()  # bounded: exactly 1 + d + d*d rows
    )
    flat = np.zeros(1 + d + d * d)
    for r in summed:
        flat[r["i"]] = r["x"]
    n = flat[0]
    if n < 2:
        raise ValueError(f"pca_fit: need >= 2 vectors, got {int(n)}")
    mean = flat[1 : 1 + d] / n
    m2 = flat[1 + d :].reshape(d, d)
    cov = (m2 - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    idx = np.argsort(evals)[::-1][:k]
    comp = evecs[:, idx]
    # sign-normalize: largest-|loading| coordinate of each component > 0
    for j in range(comp.shape[1]):
        a = comp[:, j]
        if a[np.argmax(np.abs(a))] < 0:
            comp[:, j] = -a
    return mean, comp, evals[idx]


def pca_moments_int(
    df: DataFrame, vec_col: str, scale_bits: int = 10
) -> DataFrame:
    """Exact integer-scaled moment sums — the SQL-replayable sibling of
    ``pca_fit``'s moment pass (the only stage of PCA besides ``eigh``,
    which has no SQL form).

    Each coordinate is quantized ``q = floor(x · 2^scale_bits)``:
    float32 → double is exact and multiplying by a power of two is
    exact, so the floor sees the true value and every downstream
    sum/product is BIGINT — bit-identical under any partitioning,
    accumulation order, or engine. Output rows:

    - ``(-1, -1, n)`` — vector count
    - ``(i, -1, Σ q_i)`` — first moments, i in 0..d-1
    - ``(i, j, Σ q_i·q_j)`` for i ≤ j — upper-triangle second moments

    Plan: one ``mapInPandas`` scan emits ``1 + d + d(d+1)/2`` labeled
    rows per Arrow batch (int64 matmul — exact), then a tiny
    ``groupBy(i, j)`` partial-agg combine. Same 100 TB shape as
    ``pca_fit``: the shuffle carries only per-batch moment rows, never
    vectors.
    """
    df = df.filter(F.col(vec_col).isNotNull())
    first = df.select(vec_col).first()
    if first is None:
        # the documented contract (and the DuckDB oracle's count CTE)
        # always emits the (-1, -1, n) count row — n = 0 here, not an
        # empty frame
        return df.sparkSession.createDataFrame(
            [(-1, -1, 0)], "i int, j int, val long"
        )
    d = len(first[0])
    scale = float(1 << scale_bits)
    iu, ju = np.triu_indices(d)
    labels_i = np.concatenate([[-1], np.arange(d), iu]).astype(np.int32)
    labels_j = np.concatenate(
        [[-1], np.full(d, -1), ju]
    ).astype(np.int32)

    def batch_moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [v for v in pdf.iloc[:, 0] if v is not None]
            if not vecs:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vecs]
            )
            if x.shape[1] != d:
                raise ValueError(
                    f"pca_moments_int: ragged dim {x.shape[1]} != {d}"
                )
            q = np.floor(x * scale).astype(np.int64)
            m2 = q.T @ q  # int64 matmul — exact
            vals = np.concatenate(
                [[np.int64(len(q))], q.sum(axis=0), m2[iu, ju]]
            )
            yield pd.DataFrame(
                {"i": labels_i, "j": labels_j, "val": vals}
            )

    moments = df.select(vec_col).mapInPandas(
        batch_moments, schema="i int, j int, val long"
    )
    return moments.groupBy("i", "j").agg(F.sum("val").alias("val"))


def pca_project(
    df: DataFrame,
    vec_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    out_prefix: str = "pc",
) -> DataFrame:
    """Append ``{out_prefix}1..k`` projection columns — map-only JVM
    ``zip_with`` + ``aggregate`` folds, zero Python, zero shuffle."""
    d, k = components.shape
    cols = list(df.columns)
    clash = {f"{out_prefix}{j + 1}" for j in range(k)} & set(cols)
    if clash:
        raise ValueError(
            f"pca_project output columns {sorted(clash)} already exist in "
            "the input; pass a different out_prefix"
        )
    offs = mean @ components  # (k,) — constant per component
    out = []
    for j in range(k):
        w = F.array(*[F.lit(float(c)) for c in components[:, j]])
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"), w,
                lambda x, wj: x * wj,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out.append((dot - F.lit(float(offs[j]))).alias(f"{out_prefix}{j + 1}"))
    return df.select(*cols, *out)


def pca(df: DataFrame, vec_col: str, k: int,
        out_prefix: str = "pc") -> DataFrame:
    """Fit + project in one call (two jobs: first() + moment pass)."""
    mean, comp, _ = pca_fit(df, vec_col, k)
    return pca_project(df, vec_col, mean, comp, out_prefix)
