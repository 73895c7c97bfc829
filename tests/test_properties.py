"""Property-based tests (hypothesis) for the engine's pure numeric cores —
no SparkSession needed, so these run in milliseconds and explore far more
of the input space than example-based tests."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from quickstart_streaming_agents_spark.operators.anomaly import (
    _z_for_confidence,
    ar_one_step,
    norm_ppf,
)


@given(st.floats(min_value=1e-6, max_value=1 - 1e-6))
@settings(max_examples=200, deadline=None)
def test_norm_ppf_inverts_normal_cdf(p):
    x = norm_ppf(p)
    cdf = 0.5 * (1 + math.erf(x / math.sqrt(2)))
    assert abs(cdf - p) < 1e-7


@given(st.floats(min_value=50.0, max_value=99.999))
@settings(max_examples=100, deadline=None)
def test_z_monotonic_in_confidence(c):
    assert _z_for_confidence(c) < _z_for_confidence(min(c + 0.0005, 99.9995))


@given(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    st.integers(min_value=8, max_value=64),
)
@settings(max_examples=100, deadline=None)
def test_ar_constant_series_forecasts_constant(level, n):
    """A flat history must forecast the level with near-zero residual —
    so the next identical observation is never an anomaly."""
    step = ar_one_step([level] * n, min_n=8, z=1.96)
    assert step is not None
    fc, up, lo = step
    assert fc == pytest.approx(level, abs=max(1e-6, abs(level) * 1e-9))
    assert lo - 1e-6 <= level <= up + 1e-6


@given(st.integers(min_value=0, max_value=7))
@settings(max_examples=20, deadline=None)
def test_ar_under_trained_returns_none(n):
    assert ar_one_step(list(range(n)), min_n=8, z=1.96) is None


@given(
    st.lists(st.floats(min_value=-1e3, max_value=1e3), min_size=10, max_size=60),
    st.floats(min_value=80.0, max_value=99.9),
)
@settings(max_examples=100, deadline=None)
def test_ar_bounds_ordered_and_widen_with_confidence(series, conf):
    lo_z = _z_for_confidence(conf)
    hi_z = _z_for_confidence(min(conf + 0.05, 99.95))
    a = ar_one_step(series, min_n=8, z=lo_z)
    b = ar_one_step(series, min_n=8, z=hi_z)
    assert a is not None and b is not None
    fa, ua, la = a
    fb, ub, lb = b
    assert la <= fa <= ua  # bounds bracket the forecast
    assert fa == pytest.approx(fb, rel=1e-9, abs=1e-9)  # z doesn't move point forecast
    assert ub >= ua - 1e-12 and lb <= la + 1e-12  # higher confidence → wider


# ---------------------------------------------------------------------------
# SQL-script splitter: reassembling split output must round-trip
# ---------------------------------------------------------------------------

_IDENT = st.text(alphabet="abcz_", min_size=1, max_size=6)
_LIT = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="'\x00"),
    max_size=12,
)


@st.composite
def _statement(draw):
    """A single statement: keyword + identifiers + quoted literals that may
    contain semicolons, '' escapes, and -- sequences."""
    kind = draw(st.integers(0, 2))
    name = draw(_IDENT)
    lit = draw(_LIT).replace("'", "''") + draw(st.sampled_from(["", ";", "--x", "it''s"]))
    if kind == 0:
        return f"SELECT '{lit}' AS {name}"
    if kind == 1:
        return f"SET '{name}' = '{lit}'"
    return f"DROP TABLE {name}"


@given(st.lists(_statement(), min_size=1, max_size=6), st.booleans())
@settings(max_examples=200, deadline=None)
def test_split_statements_round_trips(stmts, trailing_semi):
    from quickstart_streaming_agents_spark.script import split_statements

    script = ";\n".join(stmts) + (";" if trailing_semi else "")
    assert split_statements(script) == stmts


@given(st.lists(_statement(), min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_split_statements_ignores_comment_semicolons(stmts):
    from quickstart_streaming_agents_spark.script import split_statements

    script = "-- preamble; not a statement\n" + ";\n-- mid; comment\n".join(stmts)
    assert split_statements(script) == stmts


# ---------------------------------------------------------------------------
# mix_rates (operators/sampling.py) — pure dict arithmetic
# ---------------------------------------------------------------------------

@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=1, max_value=10**9),
        min_size=2,
        max_size=4,
    ),
    st.lists(st.floats(min_value=0.01, max_value=1.0), min_size=4, max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_mix_rates_realizes_target_mixture(counts, raw_w):
    from quickstart_streaming_agents_spark.operators.sampling import mix_rates

    strata = sorted(counts)
    total_w = sum(raw_w[: len(strata)])
    weights = {s: raw_w[i] / total_w for i, s in enumerate(strata)}
    rates = mix_rates(counts, weights)
    # feasible: every rate in (0, 1]
    assert all(0 < rates[s] <= 1.0 + 1e-12 for s in strata)
    # at least one stratum is fully kept (largest feasible sample)
    assert any(abs(rates[s] - 1.0) < 1e-9 for s in strata)
    # expected kept counts realize the target mixture
    kept = {s: counts[s] * rates[s] for s in strata}
    total = sum(kept.values())
    for s in strata:
        assert abs(kept[s] / total - weights[s]) < 1e-9


# ---------------------------------------------------------------------------
# chunking arithmetic — mirror of the JVM expression chain
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=2, max_value=64),
    st.integers(min_value=0, max_value=63),
)
@settings(max_examples=300, deadline=None)
def test_chunk_windows_cover_and_overlap(n_words, chunk, overlap):
    """The start sequence from operators/chunking.py must tile [0, n):
    full coverage, exact overlap between neighbors, in-bounds slices."""
    if overlap >= chunk:
        return
    stride = chunk - overlap
    starts = list(range(0, max(n_words - 1, 0) + 1, stride))
    covered = set()
    for s in starts:
        piece = range(s, min(s + chunk, n_words))
        assert len(piece) > 0  # no empty chunks
        covered.update(piece)
    assert covered == set(range(n_words))  # every token in >=1 chunk
    for a, b in zip(starts, starts[1:]):
        assert b - a == stride  # constant stride -> constant overlap


# ---------------------------------------------------------------------------
# BM25 scoring core (operators/retrieval): pure-math invariants of the
# Okapi weight used by both the distributed and broadcast tiers
# ---------------------------------------------------------------------------

def _okapi(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


@given(
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=99),
    st.integers(min_value=2, max_value=100),
    st.floats(min_value=1.0, max_value=500.0),
)
@settings(max_examples=200, deadline=None)
def test_bm25_weight_monotone_in_tf(tf, df, dl_i, avgdl):
    n_docs = 100
    df = min(df, n_docs - 1)
    lo = _okapi(tf, df, n_docs, float(dl_i), avgdl)
    hi = _okapi(tf + 1, df, n_docs, float(dl_i), avgdl)
    assert hi > lo  # more occurrences never score lower


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=98),
    st.floats(min_value=1.0, max_value=500.0),
)
@settings(max_examples=200, deadline=None)
def test_bm25_weight_decreases_with_df(tf, df, avgdl):
    n_docs = 100
    lo = _okapi(tf, df + 1, n_docs, avgdl, avgdl)
    hi = _okapi(tf, df, n_docs, avgdl, avgdl)
    assert hi > lo  # rarer terms weigh more


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=99),
    st.floats(min_value=2.0, max_value=500.0),
)
@settings(max_examples=200, deadline=None)
def test_bm25_weight_penalizes_long_docs(tf, df, avgdl):
    n_docs = 100
    short = _okapi(tf, df, n_docs, avgdl * 0.5, avgdl)
    long_ = _okapi(tf, df, n_docs, avgdl * 2.0, avgdl)
    assert short > long_


# ---------------------------------------------------------------------------
# Funnel snapshot semantics: order-independence of the min-based stages
# ---------------------------------------------------------------------------

def _funnel_truth(events, steps=("view", "click", "purchase")):
    """Reference implementation over one user's (ts, type) list."""
    last, out = None, []
    remaining = list(events)
    for step in steps:
        cands = [ts for ts, ty in remaining if ty == step
                 and (last is None or ts >= last)]
        if not cands:
            break
        last = min(cands)
        out.append(last)
    return out


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=100),
                  st.sampled_from(["view", "click", "purchase", "error"])),
        min_size=1, max_size=30,
    ),
    st.randoms(),
)
@settings(max_examples=100, deadline=None)
def test_funnel_truth_is_input_order_invariant(events, rnd):
    a = _funnel_truth(events)
    shuffled = list(events)
    rnd.shuffle(shuffled)
    assert _funnel_truth(shuffled) == a
    # stage times are non-decreasing by construction
    assert a == sorted(a)


# ---------------------------------------------------------------------------
# multimodal real-format codecs (operators/multimodal.py)
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=9),   # width incl. every pad residue
    st.integers(min_value=1, max_value=6),
    st.booleans(),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(w, h, top_down, seed):
    import numpy as np

    from quickstart_streaming_agents_spark.operators.multimodal import (
        _decode_bmp,
        make_bmp,
    )

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    meta, decoded = _decode_bmp(make_bmp(rgb, top_down=top_down))
    assert (meta["width"], meta["height"]) == (w, h)
    assert np.array_equal(decoded, rgb)


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767),
             min_size=1, max_size=64),
    st.integers(min_value=1, max_value=2),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(vals, channels, rate):
    import numpy as np

    from quickstart_streaming_agents_spark.operators.multimodal import (
        _decode_wav,
        make_wav,
    )

    n = len(vals) - len(vals) % channels
    if n == 0:
        return
    samples = np.array(vals[:n], dtype=np.int16).reshape(-1, channels)
    meta, decoded = _decode_wav(make_wav(samples, rate=rate))
    assert meta["width"] == channels
    assert meta["n_frames"] == samples.shape[0]
    assert meta["duration_ms"] == round(samples.shape[0] * 1000 / rate)
    assert np.array_equal(decoded, samples)


# --- AR(p=3) closed-form pin -------------------------------------------------
# The driver-checked oracles bracket the production AR solver at p=1
# (anomaly_detect_ar1, SQL regr_* replay) and p=2 (anomaly_detect_ar2,
# normal-equation replay); the general p path has no SQL-expressible oracle.
# Pin it at p=3 (training length 12..15 => p = t//4 = 3) against an
# INDEPENDENT NumPy formulation: ridge least squares solved as the
# augmented system lstsq([A; sqrt(lam) I], [y; 0]) — mathematically the
# same minimizer as ar_one_step's normal equations, numerically a
# different code path (QR on the augmented matrix vs solve on AtA).

def _ar3_reference(train, z, lam):
    import numpy as np

    train = np.asarray(train, dtype=np.float64)
    t = len(train)
    p = 3
    y = train[p:]
    A = np.stack(
        [np.ones(len(y))] + [train[p - lag:t - lag] for lag in (1, 2, 3)],
        axis=1,
    )
    aug_A = np.vstack([A, np.sqrt(lam) * np.eye(4)])
    aug_y = np.concatenate([y, np.zeros(4)])
    beta, *_ = np.linalg.lstsq(aug_A, aug_y, rcond=None)
    resid = y - A @ beta
    dof = max(1, len(y) - 4)
    sigma = float(np.sqrt((resid @ resid) / dof))
    fc = float(beta[0] + beta[1] * train[-1] + beta[2] * train[-2]
               + beta[3] * train[-3])
    return fc, fc + z * sigma, fc - z * sigma


@given(
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3,
                  allow_nan=False, allow_infinity=False),
        min_size=12, max_size=15,
    ),
    st.floats(min_value=0.5, max_value=4.0),
)
@settings(max_examples=150, deadline=None)
def test_ar_p3_matches_numpy_closed_form(train, z):
    import numpy as np

    from quickstart_streaming_agents_spark.operators.anomaly import ar_one_step

    lam = 1e-6
    got = ar_one_step(train, min_n=8, z=z, lam=lam)
    assert got is not None
    want = _ar3_reference(train, z, lam)
    scale = max(1.0, float(np.max(np.abs(train))))
    for g, w in zip(got, want):
        # shared scale-aware tolerance: both solvers regularize with the
        # same lam, so agreement is limited only by conditioning noise —
        # which is RELATIVE to the value magnitude: an ill-conditioned
        # normal matrix can push a bound to ~1e6 from ~1e2 inputs
        # (hypothesis found one live in r11b), so the output magnitude
        # must join the input scale in the tolerance
        tol = 1e-6 * max(scale, abs(w)) + 1e-8
        assert abs(g - w) <= tol, (got, want, train)


# ---------------------------------------------------------------------------
# JPEG codec (operators/multimodal.py) — pure-Python T.81 baseline
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=40),   # width
    st.integers(min_value=1, max_value=40),   # height
    st.integers(min_value=0, max_value=255),  # constant value
    st.sampled_from(["444", "420"]),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_constant_exact_any_shape(w, h, v, subsampling):
    """All-ones quant tables + constant image ⇒ bit-exact round trip at
    EVERY shape (incl. non-multiple-of-8/16 dims exercising edge-pad),
    both chroma layouts."""
    import numpy as np

    from quickstart_streaming_agents_spark.operators.multimodal import (
        _decode_jpeg,
        make_jpeg,
    )

    ones = (np.ones((8, 8), np.int64), np.ones((8, 8), np.int64))
    img = np.full((h, w, 3), v, np.uint8)
    meta, out = _decode_jpeg(
        make_jpeg(img, quant_tables=ones, subsampling=subsampling)
    )
    assert (meta["width"], meta["height"]) == (w, h)
    assert (out == img).all()


@given(
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=0, max_value=2**32 - 1),  # rng seed
)
@settings(max_examples=30, deadline=None)
def test_jpeg_q95_bounded_error_any_shape(w, h, seed):
    """Random content at quality 95 (4:4:4) stays within a tight error
    bound for any shape — quantization error only, no structural bugs
    (a mis-placed block or wrong zigzag would blow this bound up)."""
    import numpy as np

    from quickstart_streaming_agents_spark.operators.multimodal import (
        _decode_jpeg,
        make_jpeg,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    meta, out = _decode_jpeg(make_jpeg(img, quality=95))
    assert (meta["width"], meta["height"]) == (w, h)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 12.0 and err.max() <= 70


# --- r8 integer operators vs independent references ----------------------


@given(
    st.integers(min_value=2, max_value=10),
    st.data(),
)
@settings(max_examples=40, deadline=None)
def test_pagerank_recurrence_order_independent(n, data):
    """The fixed-point recurrence is accumulation-order independent on
    random graphs (exact BIGINT adds) — the property that makes ANY
    partitioning compute identical ranks. (The recurrence-vs-OPERATOR
    equality is pinned separately with a real Spark session in
    tests/test_curation_ops.py::test_pagerank_int_matches_python_recurrence
    — hypothesis here stays driver-only.)"""
    edges = data.draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            min_size=0, max_size=3 * n,
        )
    )
    scale, d = 1_000_000, 85
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: scale for v in range(n)}
    for _ in range(3):
        contrib = {v: 0 for v in range(n)}
        for s, t in edges:
            contrib[t] += r[s] // deg[s]
        r = {v: (100 - d) * scale // 100 + (d * contrib[v]) // 100
             for v in range(n)}

    # replay with the operator's exact expression semantics: Spark
    # `div` truncates toward zero == Python // for the nonnegative
    # values here; sums are order-free BIGINT adds. Recompute with a
    # different accumulation order to prove order-independence.
    contrib2: dict[int, int] = {v: 0 for v in range(n)}
    r2 = {v: scale for v in range(n)}
    for _ in range(3):
        contrib2 = {v: 0 for v in range(n)}
        for s, t in sorted(edges, reverse=True):
            contrib2[t] += r2[s] // deg[s]
        r2 = {v: (100 - d) * scale // 100 + (d * contrib2[v]) // 100
              for v in range(n)}
    assert r == r2


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_dhash_brightness_shift_invariant(data):
    """dHash only compares neighboring pixels, so adding a constant
    brightness (without clipping) never changes a single band — the
    robustness property that makes it a NEAR-dup hash."""
    import numpy as np

    from quickstart_streaming_agents_spark.operators.phash import (
        dhash_bands_py,
        dhash_grid,
    )

    px = data.draw(st.lists(st.integers(0, 200), min_size=72, max_size=72))
    shift = data.draw(st.integers(0, 55))
    img = np.asarray(px, dtype=np.uint8).reshape(8, 9)
    rgb = np.stack([img] * 3, axis=2)
    shifted = np.stack([img + shift] * 3, axis=2).astype(np.uint8)
    assert dhash_bands_py(dhash_grid(rgb)) == dhash_bands_py(
        dhash_grid(shifted)
    )
    for b in dhash_bands_py(dhash_grid(rgb)):
        assert 0 <= b <= 65535


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_energy_signature_window_permutation_and_sign_invariant(data):
    """Window energies are Σ s²: permuting samples WITHIN a window or
    flipping every sample's sign cannot change the signature (while
    moving energy ACROSS windows can)."""
    import numpy as np

    from quickstart_streaming_agents_spark.operators.afp import (
        energy_signature_py,
    )

    s = data.draw(st.lists(
        st.integers(-32767, 32767), min_size=16, max_size=16
    ))
    x = np.asarray(s, dtype=np.int64)
    base = energy_signature_py(x, 4, 4)
    perm = x.reshape(4, 4)[:, ::-1].ravel()  # reverse inside windows
    assert energy_signature_py(perm, 4, 4) == base
    assert energy_signature_py(-x, 4, 4) == base
    assert all(b >= 0 for b in base)


# ---------------------------------------------------------------------------
# Round-10 codec/walker properties — driverless (no Spark), pure Python.
# ---------------------------------------------------------------------------

_TAR_NAME = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-/",
    min_size=1, max_size=90,
).filter(lambda s: not s.startswith("/") and ".." not in s
         and not s.endswith("/") and "//" not in s)


@given(st.lists(
    st.tuples(_TAR_NAME, st.binary(min_size=0, max_size=1500)),
    min_size=1, max_size=6, unique_by=lambda e: e[0],
))
@settings(max_examples=60, deadline=None)
def test_tar_walk_matches_stdlib_on_random_archives(entries):
    import io
    import tarfile

    from quickstart_streaming_agents_spark.operators.tar import (
        tar_member_table,
    )

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        for name, content in entries:
            ti = tarfile.TarInfo(name)
            ti.size = len(content)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(content))
    p = buf.getvalue()
    tab = tar_member_table(p)
    with tarfile.open(fileobj=io.BytesIO(p)) as tf:
        std = [(m.name, m.size, m.offset, m.offset_data)
               for m in tf.getmembers()]
    assert [(m["name"], m["size"], m["offset"], m["content_offset"])
            for m in tab] == std
    for m, (_, content) in zip(tab, entries):
        assert p[m["content_offset"]:m["content_offset"] + m["size"]] \
            == content


@given(st.lists(
    st.tuples(_TAR_NAME, st.binary(min_size=0, max_size=800)),
    min_size=1, max_size=6, unique_by=lambda e: e[0],
))
@settings(max_examples=60, deadline=None)
def test_zip_walk_matches_stdlib_on_random_archives(entries):
    import io
    import zipfile
    import zlib

    from quickstart_streaming_agents_spark.operators.zipindex import (
        zip_member_table,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for name, content in entries:
            z.writestr(zipfile.ZipInfo(name), content)
    p = buf.getvalue()
    tab = zip_member_table(p)
    with zipfile.ZipFile(io.BytesIO(p)) as z:
        std = [(m.filename, m.file_size, m.header_offset)
               for m in z.infolist()]
    assert [(m["name"], m["uncomp_size"], m["header_offset"])
            for m in tab] == std
    for m, (_, content) in zip(tab, entries):
        assert p[m["data_offset"]:m["data_offset"] + m["comp_size"]] \
            == content
        assert m["crc_ok"]
        assert m["crc32"] == zlib.crc32(content) & 0xFFFFFFFF


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767),
             min_size=1, max_size=400),
    st.sampled_from([9, 17, 41]),
    st.sampled_from([1, 2]),
)
@settings(max_examples=40, deadline=None)
def test_ima_adpcm_decode_equals_reference_on_random_signals(samples, bs, ch):
    """Random signals, block sizes and channel counts: the operator's
    decode must equal the independently written reference decoder
    sample-for-sample, and every block-leading sample is verbatim
    (stored in the block header)."""
    import numpy as np

    from quickstart_streaming_agents_spark.operators.multimodal import (
        _decode_wav,
        make_wav_ima_adpcm,
    )
    from tests.test_afp import _ima_decode_independent

    arr = np.asarray(samples, dtype=np.int16)
    if ch == 2:
        arr = np.stack([arr, arr[::-1]], axis=1)
    p = make_wav_ima_adpcm(arr, block_samples=bs)
    _, out = _decode_wav(p)
    arr2 = arr.reshape(-1, ch) if arr.ndim > 1 else arr[:, None]
    assert out.shape == arr2.shape
    # block-leading samples are verbatim
    for b0 in range(0, arr2.shape[0], bs):
        assert (out[b0] == arr2[b0]).all()
    ref = _ima_decode_independent(p)
    want = np.stack([np.asarray(c, dtype=np.int16) for c in ref], axis=1)
    assert (out == want).all()


@given(st.binary(min_size=0, max_size=600))
@settings(max_examples=60, deadline=None)
def test_g711_decode_matches_audioop_on_random_bytes(data):
    import numpy as np
    import pytest

    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            import audioop
    except ImportError:
        pytest.skip("audioop removed on this runtime")

    from quickstart_streaming_agents_spark.operators.multimodal import (
        _decode_wav,
        make_wav_g711,
    )

    for law, fn in (("ulaw", audioop.ulaw2lin), ("alaw", audioop.alaw2lin)):
        p = make_wav_g711(data, law=law)
        _, out = _decode_wav(p)
        want = np.frombuffer(fn(data, 2), dtype="<i2")
        assert (out[:, 0] == want).all()


_MOJI_CHARS = st.text(
    alphabet=(
        "abc XYZ 123 .,!"
        "éàüñÉ"          # Latin-1 letters
        "‘’“”–—…€"  # cp1252 punct
    ),
    min_size=1, max_size=60,
)


@given(_MOJI_CHARS)
@settings(max_examples=50, deadline=None)
def test_mojibake_repair_inverts_whatwg_cp1252_corruption(spark, s):
    """For text whose non-ASCII chars live in the Latin-1/cp1252 reach
    (UTF-8 leads C2/C3/E2), corrupting via the WHATWG cp1252 misreading
    and repairing must restore the original — or, when the text has no
    non-ASCII char at all, corruption is the identity and repair must
    not touch it."""
    from quickstart_streaming_agents_spark.functions.text import (
        mojibake_repair,
    )

    def whatwg1252(data: bytes) -> str:
        return "".join(
            chr(b) if b in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else bytes([b]).decode("cp1252") for b in data
        )

    corrupted = whatwg1252(s.encode("utf-8"))
    df = spark.createDataFrame([(corrupted,)], ["t"])
    m = mojibake_repair("t")
    row = df.select(m["text_out"].alias("o"),
                    m["repaired"].alias("r")).first()
    if corrupted == s:  # pure-ASCII input: nothing to repair
        assert row.o == s
    else:
        assert row.r and row.o == s


# --- round 11b container parsers: synth→parse round trips ------------------

@given(
    st.integers(min_value=1, max_value=(1 << 20) - 1),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=4, max_value=32),
    st.integers(min_value=0, max_value=(1 << 36) - 1),
    st.binary(min_size=16, max_size=16),
)
@settings(max_examples=150, deadline=None)
def test_flac_streaminfo_roundtrip(rate, ch, bps, total, md5sig):
    from quickstart_streaming_agents_spark.operators.flac import (
        flac_stream_table,
        make_flac,
    )

    t = flac_stream_table(make_flac(rate, ch, bps, total, audio_md5=md5sig))
    assert (t["sample_rate"], t["channels"], t["bits_per_sample"],
            t["total_samples"]) == (rate, ch, bps, total)
    assert t["audio_md5"] == md5sig.hex()
    assert t["duration_ms"] == total * 1000 // rate


@given(
    st.lists(st.binary(min_size=0, max_size=700), min_size=1, max_size=5),
    st.integers(min_value=-(1 << 62), max_value=(1 << 62) - 1),
    st.integers(min_value=0, max_value=(1 << 32) - 1),
)
@settings(max_examples=100, deadline=None)
def test_ogg_page_roundtrip_any_packet_shape(packets, granule, serial):
    """Lacing round trip incl. 255-boundary packets (a len-255k packet
    ends with a 0 lacing value) — payload length and packet count must
    survive for ANY packet sizes, and the CRC must verify."""
    from quickstart_streaming_agents_spark.operators.ogg import (
        make_ogg_page,
        ogg_page_table,
    )

    try:
        page = make_ogg_page(packets, granule, serial, 0)
    except ValueError:
        return  # >255 lacing slots: synth refuses by contract
    (r,) = ogg_page_table(page)
    assert r["payload_length"] == sum(len(p) for p in packets)
    assert r["n_packets"] == len(packets)
    assert r["granule"] == granule and r["serial"] == serial


@given(
    st.lists(
        st.lists(st.binary(min_size=0, max_size=50), min_size=0, max_size=4),
        min_size=0, max_size=4,
    ),
    st.binary(min_size=16, max_size=16),
)
@settings(max_examples=100, deadline=None)
def test_ocf_block_roundtrip(blocks, sync):
    from quickstart_streaming_agents_spark.operators.avro_ocf import (
        make_ocf,
        ocf_table,
    )

    t = ocf_table(make_ocf(blocks, '{"type":"string"}', sync=sync))
    assert [(b["n_records"], b["byte_size"]) for b in t["blocks"]] == [
        (len(recs), sum(len(r) for r in recs)) for recs in blocks
    ]


@given(st.integers(min_value=0, max_value=(1 << 62) - 1))
@settings(max_examples=200, deadline=None)
def test_thrift_varint_zigzag_roundtrip(n):
    """The parquet footer reader's varint/zigzag must invert avro's
    writer (both implement the same LEB128+zigzag encoding)."""
    from quickstart_streaming_agents_spark.operators.parquet_meta import (
        _Reader,
    )
    from quickstart_streaming_agents_spark.sources.avro import _write_long

    for v in (n, -n):
        out = bytearray()
        _write_long(out, v)
        assert _Reader(bytes(out)).zigzag() == v
