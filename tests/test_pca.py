"""Distributed PCA pinned against an independent full-matrix NumPy PCA.

The operator computes covariance from single-pass distributed moments
(Σx, Σxxᵀ); the reference here recomputes it the textbook way
(center first, then X_cᵀX_c) — different arithmetic path, same answer
to float tolerance. No SQL oracle is possible (eigendecomposition), so
this test is the correctness pin backing the rows-only driver check of
the ``pca_project`` query.
"""

from __future__ import annotations

import numpy as np
import pytest

from quickstart_streaming_agents_spark.operators.pca import (
    pca,
    pca_fit,
    pca_project,
)


def _reference_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    xc = x - mean
    cov = xc.T @ xc / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    idx = np.argsort(evals)[::-1][:k]
    comp = evecs[:, idx]
    for j in range(k):
        if comp[np.argmax(np.abs(comp[:, j])), j] < 0:
            comp[:, j] = -comp[:, j]
    return mean, comp, evals[idx]


def _make_df(spark, x):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pca_matches_numpy_reference(spark):
    rng = np.random.RandomState(42)
    # anisotropic cloud: distinct, well-separated eigenvalues
    basis = rng.randn(6, 6)
    x = rng.randn(300, 6) * np.array([8.0, 4.0, 2.0, 1.0, 0.5, 0.25]) @ basis
    df = _make_df(spark, x).repartition(7)  # moments cross partitions

    mean, comp, evals = pca_fit(df, "embedding", k=3)
    rmean, rcomp, revals = _reference_pca(x, 3)

    np.testing.assert_allclose(mean, rmean, atol=1e-9)
    np.testing.assert_allclose(evals, revals, rtol=1e-8)
    np.testing.assert_allclose(comp, rcomp, atol=1e-7)
    # components are orthonormal
    np.testing.assert_allclose(comp.T @ comp, np.eye(3), atol=1e-10)

    out = pca_project(df, "embedding", mean, comp).collect()
    got = {r.vec_id: [r.pc1, r.pc2, r.pc3] for r in out}
    want = (x - rmean) @ rcomp
    for i in range(len(x)):
        np.testing.assert_allclose(got[i], want[i], atol=1e-7)
    # projected variance per axis equals the eigenvalue
    proj = np.array([got[i] for i in range(len(x))])
    np.testing.assert_allclose(proj.var(axis=0, ddof=1), revals, rtol=1e-6)


def test_pca_partition_invariance(spark):
    rng = np.random.RandomState(7)
    x = rng.randn(100, 5)
    a = pca_fit(_make_df(spark, x).repartition(1), "embedding", 2)
    b = pca_fit(_make_df(spark, x).repartition(13), "embedding", 2)
    np.testing.assert_allclose(a[0], b[0], atol=1e-12)
    np.testing.assert_allclose(a[1], b[1], atol=1e-9)


def test_pca_guards(spark):
    df = _make_df(spark, np.zeros((1, 4)))
    with pytest.raises(ValueError, match=">= 2 vectors"):
        pca_fit(df, "embedding", 2)
    df2 = _make_df(spark, np.zeros((5, 4)))
    with pytest.raises(ValueError, match="1 <= k <= dim"):
        pca_fit(df2, "embedding", 9)


def test_pca_end_to_end_helper(spark):
    rng = np.random.RandomState(1)
    x = rng.randn(60, 4)
    out = pca(_make_df(spark, x), "embedding", k=2)
    assert out.columns[-2:] == ["pc1", "pc2"]
    assert out.count() == 60


def test_pca_project_refuses_column_clash(spark):
    rng = np.random.RandomState(2)
    x = rng.randn(10, 3)
    df = _make_df(spark, x).withColumn(
        "pc1", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(0.0)
    )
    mean, comp, _ = pca_fit(_make_df(spark, x), "embedding", 2)
    with pytest.raises(ValueError, match="already exist"):
        pca_project(df, "embedding", mean, comp)


def test_pca_fit_skips_null_vectors(spark):
    """A NULL embedding anywhere — including the FIRST scanned row —
    is dropped, not fatal, and does not change the fitted basis
    (ADVICE r7: fit must not depend on scan order of one dirty row)."""
    rng = np.random.RandomState(3)
    x = rng.randn(40, 4)
    clean = _make_df(spark, x)
    dirty = spark.createDataFrame(
        [(999, None)], "vec_id long, embedding array<double>"
    ).union(clean).coalesce(1)  # NULL row first in scan order
    a = pca_fit(clean, "embedding", 2)
    b = pca_fit(dirty, "embedding", 2)
    np.testing.assert_allclose(a[0], b[0], atol=1e-12)
    np.testing.assert_allclose(a[1], b[1], atol=1e-9)


def test_pca_projected_variance_monotone(spark):
    """Invariant backing the pca_project driver row (hash-checked
    since r12 via per-row Bessel certificates): the
    sample variance of the projected coordinates is non-increasing
    pc1 ≥ pc2 ≥ … ≥ pck and matches the fitted eigenvalues."""
    rng = np.random.RandomState(4)
    x = rng.randn(200, 6) @ np.diag([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    df = _make_df(spark, x)
    mean, comp, evals = pca_fit(df, "embedding", 4)
    pdf = (
        pca_project(df, "embedding", mean, comp)
        .select("pc1", "pc2", "pc3", "pc4")
        .toPandas()
    )
    var = pdf.var(ddof=1).to_numpy()
    assert np.all(np.diff(var) <= 1e-9), var
    np.testing.assert_allclose(var, evals, rtol=1e-6)


def test_pca_moments_matches_numpy(spark):
    """Integer-scaled moment rows equal a direct NumPy quantization —
    the in-repo twin of the pca_moments DuckDB oracle."""
    from quickstart_streaming_agents_spark.operators.pca import (
        pca_moments_int,
    )

    rng = np.random.RandomState(5)
    x = rng.randn(50, 3)
    q = np.floor(x * 1024).astype(np.int64)
    rows = {
        (r["i"], r["j"]): r["val"]
        for r in pca_moments_int(
            _make_df(spark, x).repartition(7), "embedding"
        ).collect()
    }
    assert rows[(-1, -1)] == 50
    s1 = q.sum(axis=0)
    m2 = q.T @ q
    for i in range(3):
        assert rows[(i, -1)] == s1[i]
        for j in range(i, 3):
            assert rows[(i, j)] == m2[i, j]
    assert len(rows) == 1 + 3 + 6
