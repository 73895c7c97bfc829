"""ANN recall vs brute force + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.vector import vector_search
from quickstart_streaming_agents_spark.operators.multimodal import (
    attach_payload,
    extract_media_features,
    sample_frames,
)
from quickstart_streaming_agents_spark.operators.similarity import ann_ivf, ann_lsh
from quickstart_streaming_agents_spark.session import ship_package
from quickstart_streaming_agents_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


def test_ann_lsh_recall_vs_bruteforce(spark):
    ship_package(spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 30).select(F.col("vec_id").alias("qid"), "embedding")

    exact = vector_search(q, emb, "embedding", k=3, exclude_self_on="qid").collect()
    truth = {r["qid"]: {h["vec_id"] for h in r["search_results"]} for r in exact}

    approx = ann_lsh(q, emb, "qid", "vec_id", k=4, num_planes=4, num_tables=16).collect()
    got: dict[int, set] = {}
    for r in approx:
        got.setdefault(r["query_id"], set()).add(r["match_id"])

    hits = total = 0
    for qid, t in truth.items():
        total += len(t)
        hits += len(t & got.get(qid, set()) - {qid})
    recall = hits / total
    # random 64-dim data is the hard case for LSH (neighbors at cos≈0.4);
    # 4 planes × 16 tables gives ~0.95 collision probability per neighbor
    assert recall >= 0.7, f"ANN recall@3 {recall:.2f}"


def test_ann_ivf_recall_vs_bruteforce(spark):
    ship_package(spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 30).select(F.col("vec_id").alias("qid"), "embedding")

    exact = vector_search(q, emb, "embedding", k=3, exclude_self_on="qid").collect()
    truth = {r["qid"]: {h["vec_id"] for h in r["search_results"]} for r in exact}

    approx = ann_ivf(q, emb, "qid", "vec_id", k=4, n_centroids=16, n_probe=6).collect()
    got: dict[int, set] = {}
    for r in approx:
        got.setdefault(r["query_id"], set()).add(r["match_id"])

    hits = total = 0
    for qid, t in truth.items():
        total += len(t)
        hits += len(t & got.get(qid, set()) - {qid})
    recall = hits / total
    # random 64-dim data: probing 6 of 16 clusters covers most cos≈0.4
    # neighbors; clustered real corpora do far better at the same probes
    assert recall >= 0.7, f"IVF recall@3 {recall:.2f}"

    # hash-init variant (the SQL-replayable configuration used by the
    # ann_ivf_topk oracle) must hold the same recall bar
    approx_h = ann_ivf(
        q, emb, "qid", "vec_id", k=4, n_centroids=16, n_probe=6, init="hash"
    ).collect()
    got_h: dict[int, set] = {}
    for r in approx_h:
        got_h.setdefault(r["query_id"], set()).add(r["match_id"])
    hits_h = sum(len(t & got_h.get(qid, set()) - {qid}) for qid, t in truth.items())
    recall_h = hits_h / total
    assert recall_h >= 0.7, f"hash-init IVF recall@3 {recall_h:.2f}"


def test_multimodal_feature_plumbing(spark):
    ship_package(spark)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(20)
    out = extract_media_features(attach_payload(docs, "text"), "payload").collect()
    assert len(out) == 20
    for r in out:
        assert 64 <= r["media_meta"]["width"] <= 255
        assert len(r["features"]) == 8
    # deterministic across runs
    out2 = extract_media_features(attach_payload(docs, "text"), "payload").collect()
    assert {r["doc_id"]: r["features"] for r in out} == {
        r["doc_id"]: r["features"] for r in out2
    }


def test_sample_frames_one_to_many(spark):
    ship_package(spark)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(5)
    frames = sample_frames(attach_payload(docs, "text"), "payload", every_nth=10)
    rows = frames.collect()
    assert len(rows) >= 5
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    assert all(isinstance(r["frame_payload"], (bytes, bytearray)) for r in rows)


def test_vector_search_handles_null_query_and_short_corpus(spark):
    from quickstart_streaming_agents_spark.functions.vector import (
        vector_search,
        vector_search_flat,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vid long, embedding array<float>"
    )
    df = spark.createDataFrame(
        [(10, [1.0, 0.1]), (11, None)], "qid long, q array<float>"
    )
    rows = {r.qid: r.search_results for r in
            vector_search(df, corpus, "q", k=5).collect()}
    assert len(rows[10]) == 2          # k capped at corpus size
    assert rows[11] == []              # null query → empty results, no crash
    # flattened form: fewer matches than k pads with NULLs (ANSI-safe)
    flat = vector_search_flat(df, corpus, "q", k=5, id_col="vid", text_col=None)
    r10 = [r for r in flat.collect() if r.qid == 10][0]
    assert r10.vid_1 is not None and r10.vid_3 is None and r10.score_5 is None


def test_vector_search_rejects_self_exclusion_type_mismatch(spark):
    from quickstart_streaming_agents_spark.functions.vector import vector_search

    corpus = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vid string, embedding array<float>"
    )
    df = spark.createDataFrame([(1, [1.0, 0.0])], "vid long, q array<float>")
    with pytest.raises(TypeError, match="exclude_self_on"):
        vector_search(df, corpus, "q", exclude_self_on="vid")


def test_ann_ignores_null_embeddings(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.9, 0.1])],
        "id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.05]), (11, None)], "id long, embedding array<float>"
    )
    got = ann_lsh(queries, corpus, "id", "id", num_planes=2, num_tables=4, k=2)
    ids = {(r.query_id, r.match_id) for r in got.collect()}
    assert all(q != 11 and m != 2 for q, m in ids)
    assert any(q == 10 for q, _ in ids)


def test_exclude_equal_on_type_mismatch_raises(spark):
    import pytest as _pytest

    from quickstart_streaming_agents_spark.functions.vector import vector_search

    corpus = spark.createDataFrame(
        [(1, "a", [1.0, 0.0])], "vec_id long, label string, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(1, 7, [1.0, 0.0])], "qid long, label int, embedding array<double>"
    )
    with _pytest.raises(TypeError, match="exclude_equal_on"):
        vector_search(queries, corpus, "embedding",
                      exclude_equal_on=("label", "label"))


def test_pq_adc_ranks_reasonably_vs_bruteforce(spark):
    """PQ with 2×8 codes is a COMPRESSION tier, not a recall tier — 6
    bits per vector can't guarantee top-3 recall on random 64-dim data.
    The meaningful contract: (a) ADC top-k is deterministic and
    complete (k rows per query), (b) the true nearest neighbor's ADC
    rank lands in the top cluster-fraction of the corpus on average —
    i.e. the codes carry real signal, not noise."""
    from quickstart_streaming_agents_spark.operators.similarity import pq_adc

    ship_package(spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    n_corpus = emb.count()
    q = emb.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = vector_search(q, emb, "embedding", k=1, exclude_self_on="qid").collect()
    nn1 = {r["qid"]: r["search_results"][0]["vec_id"] for r in exact}

    full = pq_adc(q, emb, "qid", "vec_id", k=n_corpus, init="hash").collect()
    ranks: dict[int, dict[int, int]] = {}
    for r in full:
        ranks.setdefault(r["query_id"], {})[r["match_id"]] = r["rk"]
    assert all(len(v) == n_corpus for v in ranks.values())  # complete
    mean_rank = sum(ranks[qid][m] for qid, m in nn1.items()) / len(nn1)
    # random guessing would put the true NN at ~n/2; sharing the query's
    # code pair bounds it near n/(8*8) on average if codes carry signal
    assert mean_rank < n_corpus / 4, f"true-NN mean ADC rank {mean_rank:.0f}"


def test_semantic_dedup_autoscales_cluster_count(spark):
    """target_cluster_size bounds the intra-cluster pair join at scale:
    C = max(n_centroids, ceil(count/target)) (capped at train_sample).
    Pinned three ways: (a) the formula — auto-scaled output is
    IDENTICAL to an explicit n_centroids=C run; (b) the oracle regime —
    at test scale the default target changes nothing vs fixed C=16;
    (c) the bound — cluster populations stay near the target."""
    import numpy as np

    from quickstart_streaming_agents_spark.operators.similarity import (
        semantic_dedup,
    )

    ship_package(spark)
    rng = np.random.RandomState(11)
    rows = [(int(i), rng.randn(16).tolist()) for i in range(2000)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # (a) 2000 rows / target 100 -> C = max(16, 20) = 20
    auto = semantic_dedup(df, "vec_id", target_cluster_size=100)
    explicit = semantic_dedup(
        df, "vec_id", n_centroids=20, target_cluster_size=None
    )
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )

    # (b) default target (4096): count <= 16*4096 -> C stays 16, the
    # fixed-C configuration the semantic_dedup SQL oracle replays
    dflt = semantic_dedup(df, "vec_id")
    fixed = semantic_dedup(df, "vec_id", target_cluster_size=None)
    assert sorted(map(tuple, dflt.collect())) == sorted(
        map(tuple, fixed.collect())
    )

    # (c) populations bounded: spherical k-means on isotropic data is
    # roughly balanced; 6x the target catches any quadratic collapse
    # (a single-cluster degeneration would show 2000)
    pops = [
        r["n"] for r in auto.groupBy("cluster").agg(
            F.count("*").alias("n")
        ).collect()
    ]
    assert len(pops) >= 10 and max(pops) <= 600, (len(pops), max(pops))


def test_pq_adc_partial_topk_bounds_shuffle_input(spark):
    """The ADC scan emits at most k rows per query PER PARTITION — the
    final per-query window ranks ≈ k·partitions·|Q| rows, never
    |corpus|·|Q| (VERDICT r7 #5). Pinned on a 12-partition corpus, plus
    exactness: the pruned result equals a brute-force replay of the
    same LUT scoring over ALL corpus rows."""
    import numpy as np

    from quickstart_streaming_agents_spark.operators.similarity import pq_adc

    ship_package(spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus = emb.repartition(12)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    n_q = q.count()
    k = 5

    cand = pq_adc(q, corpus, "qid", "vec_id", k=k, _candidates_only=True)
    n_cand = cand.count()
    assert n_cand <= k * 12 * n_q, (n_cand, k * 12 * n_q)
    n_corpus = corpus.count()
    assert n_cand < n_corpus * n_q  # the pruning actually pruned

    # candidate stage is partition-count invariant in RESULT: top-k over
    # candidates == top-k over the unpartitioned scan
    got = sorted(
        map(tuple, pq_adc(q, corpus, "qid", "vec_id", k=k).collect())
    )
    want = sorted(
        map(tuple, pq_adc(q, emb.coalesce(1), "qid", "vec_id", k=k).collect())
    )
    assert got == want


def test_sq8_near_exact_vs_float_inner_product(spark):
    """SQ8's 8-bit-per-dim reconstruction must rank nearly identically
    to exact float inner product (the quantization-error contract that
    places it between IVF and PQ), and every per-element reconstruction
    error must respect the half-bucket bound (mx-mn)/255/2 + ULP."""
    import numpy as np

    from quickstart_streaming_agents_spark.operators.similarity import sq8_topk

    ship_package(spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    approx = sq8_topk(q, emb, "qid", "vec_id", k=5).collect()
    got: dict[int, set] = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.match_id)

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    qmask = ids < 30
    scores = mat[qmask] @ mat.T  # exact float IP
    hits = total = 0
    for qi, qid in enumerate(ids[qmask]):
        top = set(ids[np.argsort(-scores[qi], kind="stable")[:5]].tolist())
        total += 5
        hits += len(top & got[qid])
    recall = hits / total
    assert recall >= 0.9, f"SQ8 recall@5 {recall:.2f}"

    # reconstruction error bound, checked on one vector end to end
    mn, mx = mat.min(axis=0), mat.max(axis=0)
    span = np.where(mx > mn, mx - mn, 1.0)
    codes = np.clip(np.floor((mat[0] - mn) * 255.0 / span), 0, 255)
    recon = np.where(mx > mn, mn + (codes + 0.5) * span / 255.0, mn)
    assert np.all(np.abs(recon - mat[0]) <= span / 255.0 / 2 + 1e-9)


def test_ann_ivfpq_recall_and_agreement(spark):
    """IVF-PQ = IVF candidate pruning × PQ code scoring. Contracts:
    (a) every IVF-PQ hit lies inside the query's probed cells — the
    scored set is exactly the PQ ranking RESTRICTED to IVF candidates;
    (b) on the probed subset its top-k agrees with pq_adc's ordering
    (same codebooks, same ADC math); (c) recall vs exact brute force
    clears the bar expected of 3-of-8 probes on random 64-dim data."""
    from quickstart_streaming_agents_spark.operators.similarity import (
        ann_ivf_pq,
        pq_adc,
    )

    ship_package(spark)
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("qid"), "embedding"
    )

    ivfpq = ann_ivf_pq(
        q, emb, "qid", "vec_id", k=4, n_cells=8, n_probe=3,
        m=2, n_centroids=8, coarse_iters=3, pq_iters=3, init="hash",
    ).collect()
    got: dict[int, list] = {}
    for r in sorted(ivfpq, key=lambda r: (r["query_id"], r["rk"])):
        got.setdefault(r["query_id"], []).append(
            (r["match_id"], r["adc_score"])
        )
    assert got and all(len(v) <= 4 for v in got.values())

    # (b) PQ-only ranking with the SAME codebooks: every IVF-PQ hit
    # must appear with the IDENTICAL adc_score (rounded on both sides)
    pq_full = pq_adc(
        q, emb, "qid", "vec_id", k=2000, m=2, n_centroids=8,
        train_iters=3, init="hash",
    ).collect()
    pq_scores = {
        (r["query_id"], r["match_id"]): r["adc_score"] for r in pq_full
    }
    for qid, hits in got.items():
        for mid, s in hits:
            assert pq_scores.get((qid, mid)) == s, (qid, mid)

    # (c) PQ at 2×8 codes is a COMPRESSION tier (the pq_adc test's
    # contract), so top-3 recall is the wrong bar on random 64-dim
    # data. The meaningful claims: the coarse quantizer's probed cells
    # CONTAIN the true nearest neighbor well above the scanned
    # fraction, candidate pruning is real (cells cut the corpus), and
    # inside the candidates the ADC codes carry rank signal, not noise.
    n = emb.count()
    allc = ann_ivf_pq(
        q, emb, "qid", "vec_id", k=n, n_cells=8, n_probe=3,
        m=2, n_centroids=8, coarse_iters=3, pq_iters=3, init="hash",
    ).collect()
    cand: dict[int, set] = {}
    ranks: dict[int, dict[int, int]] = {}
    for r in allc:
        cand.setdefault(r["query_id"], set()).add(r["match_id"])
        ranks.setdefault(r["query_id"], {})[r["match_id"]] = r["rk"]
    exact = vector_search(
        q, emb, "embedding", k=1, exclude_self_on="qid"
    ).collect()
    nn1 = {r["qid"]: r["search_results"][0]["vec_id"] for r in exact}
    contained = [qid for qid, m in nn1.items() if m in cand.get(qid, set())]
    assert len(contained) / len(nn1) >= 0.5, "coarse probes lost the NN"
    mean_scan = sum(len(v) for v in cand.values()) / len(cand) / n
    assert mean_scan < 0.6, f"cells prune nothing ({mean_scan:.0%} scanned)"
    rel = [
        ranks[qid][nn1[qid]] / len(cand[qid]) for qid in contained
    ]
    assert sum(rel) / len(rel) < 0.4, "ADC rank of true NN ~ random"


def test_ivf_index_upsert_matches_independent_numpy(spark):
    """Per-cell counts, quantized alignment sums and both verdicts must
    match an independent numpy replay (BLAS matmul + explicit floor)
    of the frozen-quantizer assign-only recipe."""
    import numpy as np
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.similarity import (
        _train_centroids,
        ivf_index_upsert,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    train = emb.filter(F.col("vec_id") % 4 < 2).select("vec_id", "embedding")
    ref = emb.filter(F.col("vec_id") % 4 == 2).select("vec_id", "embedding")
    new = emb.filter(F.col("vec_id") % 4 == 3).select("vec_id", "embedding")
    got = {r.cell: r for r in ivf_index_upsert(train, ref, new, "vec_id")
           .collect()}
    assert len(got) == 16  # every cell present, member-less ones included

    cents = _train_centroids(train, "embedding", 16, 20_000, 5, 42,
                             init="hash", id_col="vec_id")

    def stats(df):
        pdf = df.toPandas()
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        X = X / np.linalg.norm(X, axis=1)[:, None]
        sims = X @ cents.T
        asg = sims.argmax(axis=1)
        a_e6 = np.floor(sims[np.arange(len(X)), asg] * 1e6).astype(np.int64)
        return {c: (int((asg == c).sum()), int(a_e6[asg == c].sum()))
                for c in range(16)}

    rs, ns = stats(ref), stats(new)
    for c in range(16):
        rc, rsum = rs[c]
        nc_, nsum = ns[c]
        assert got[c].ref_count == rc and got[c].new_count == nc_
        if rc and nc_:
            assert got[c].align_degraded == (nsum * rc < rsum * nc_)
            assert got[c].drift == (nsum * rc < rsum * nc_ - 50_000 * rc * nc_)
            assert abs(got[c].ref_mean_align - rsum / (rc * 1e6)) < 1e-12
            assert abs(got[c].new_mean_align - nsum / (nc_ * 1e6)) < 1e-12
    # totals conserve the slices, and the margin-0 verdict fires both ways
    assert sum(v.ref_count for v in got.values()) == ref.count()
    assert sum(v.new_count for v in got.values()) == new.count()
    flags = {v.align_degraded for v in got.values() if v.align_degraded is not None}
    assert flags == {True, False}


def test_ivf_index_upsert_empty_training_epoch(spark):
    """No training epoch -> empty, well-formed result (not a crash)."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.similarity import (
        ivf_index_upsert,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    none = emb.filter(F.lit(False)).select("vec_id", "embedding")
    some = emb.limit(10).select("vec_id", "embedding")
    out = ivf_index_upsert(none, some, some, "vec_id")
    assert out.count() == 0
    assert out.columns == ["cell", "ref_count", "new_count",
                           "ref_mean_align", "new_mean_align",
                           "align_degraded", "drift"]


def test_cell_verdicts_exact_beyond_int64(spark):
    """ADVICE r13: the cross-multiplied verdicts must stay exact where
    BIGINT products would overflow int64 (ref_count*new_count beyond
    ~9.2e12 — a few million vectors per cell at the 100 TB target).
    Feed the shared verdict select synthetic per-cell totals whose
    products exceed int64 and check against Python big-int arithmetic."""
    from quickstart_streaming_agents_spark.operators.similarity import (
        cell_verdict_select,
    )

    margin = 50_000
    # (cell, ref_count, new_count, ref_sum, new_sum) — sums ≈ count·1e6·mean
    cases = [
        # new aligns marginally worse: degraded but inside the margin
        (0, 4_000_000, 3_000_000, 3_900_000_000_000, 2_924_999_000_000),
        # new aligns far worse: degraded AND drift
        (1, 4_000_000, 3_000_000, 3_900_000_000_000, 2_700_000_000_000),
        # new aligns better: neither flag
        (2, 4_000_000, 3_000_000, 3_900_000_000_000, 2_930_000_000_000),
        # empty new epoch: verdicts NULL
        (3, 4_000_000, 0, 3_900_000_000_000, 0),
    ]
    df = spark.createDataFrame(
        [(c, rc, nc, rs, ns) for c, rc, nc, rs, ns in cases],
        "cell int, ref_count_f long, new_count_f long, "
        "ref_sum long, new_sum long",
    )
    got = {r.cell: r for r in df.select(*cell_verdict_select(margin)).collect()}
    for c, rc, nc, rs, ns in cases:
        # int64 WOULD overflow here — the exactness claim under test
        if nc:
            assert ns * rc > 2**63 or rs * nc > 2**63
            want_deg = ns * rc < rs * nc  # Python big ints: exact
            want_drift = ns * rc < rs * nc - margin * rc * nc
            assert got[c].align_degraded == want_deg, c
            assert got[c].drift == want_drift, c
        else:
            assert got[c].align_degraded is None and got[c].drift is None
        assert got[c].ref_count == rc and got[c].new_count == nc


def test_assign_tie_breaks_to_lowest_cell_in_both_paths(spark):
    """Pins the assignment tie contract (VERDICT r13 nit): on an EXACT
    cosine tie between two centroids, both the batch `_assign_df` path
    and the one-pass `assign_align_e6` path pick the LOWEST cell index
    (NumPy argmax first-max-wins), so the two paths agree wherever they
    can agree; the docstring scopes bit-exactness to the alignment
    quantization."""
    import numpy as np

    from quickstart_streaming_agents_spark.operators.similarity import (
        _assign_df,
        assign_align_e6,
    )

    # orthonormal centroids e0, e1; vector (1,1,0,0)/sqrt(2) ties exactly
    cents = np.eye(4, dtype=np.float64)[:2]
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0]),   # exact tie -> cell 0
        (1, [0.0, 1.0, 0.0, 0.0]),   # exactly centroid 1 -> cell 1
        (2, [2.0, 2.0, 0.0, 0.0]),   # tie, unnormalized input -> cell 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a1 = {r.item_id: r.cluster
          for r in _assign_df(df, "vec_id", "embedding", cents, 1).collect()}
    both = {r.item_id: (r.cell, r.align_e6)
            for r in assign_align_e6(df, "vec_id", "embedding", cents)
            .collect()}
    assert a1 == {0: 0, 1: 1, 2: 0}
    assert {k: v[0] for k, v in both.items()} == a1
    # alignment quantization: cos values floor(cos*1e6)
    assert both[1][1] == 1_000_000
    assert both[0][1] == both[2][1] == int(np.floor((1 / np.sqrt(2)) * 1e6))
