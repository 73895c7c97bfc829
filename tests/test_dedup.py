"""Dedup operator behavior: planted near-dups found by every strategy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from quickstart_streaming_agents_spark.session import ship_package
from quickstart_streaming_agents_spark.sources.parquet import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def exact_pairs(spark):
    ship_package(spark)
    docs = load_table(spark, SF_DIR, "documents")
    rows = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    return {(r["id_a"], r["id_b"]) for r in rows}


def test_planted_near_dups_exist(exact_pairs):
    # the driver fixtures plant high-jaccard pairs; the exact operator is
    # the ground truth the approximate ones are measured against
    assert len(exact_pairs) >= 5


def test_minhash_recall(spark, exact_pairs):
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
        ).collect()
    }
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"minhash recall {recall:.2f} over {len(exact_pairs)} pairs"
    # precision against a permissive exact threshold: no wild false positives
    assert len(got) <= len(exact_pairs) * 3


def test_simhash_finds_planted_dups(spark, exact_pairs):
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    recall = len(got & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"simhash recall {recall:.2f}"


def test_dedup_exact_keeps_one_per_key(spark):
    events = load_table(spark, SF_DIR, "events")
    out = dedup_exact(
        events, cols=["user_id", "event_type"], order_by=["ts", "event_id"]
    )
    dup = out.groupBy("user_id", "event_type").count().filter(F.col("count") > 1)
    assert dup.count() == 0
    # kept row is the earliest
    first = (
        events.groupBy("user_id", "event_type").agg(F.min("ts").alias("min_ts"))
    )
    joined = out.join(first, ["user_id", "event_type"])
    assert joined.filter(F.col("ts") != F.col("min_ts")).count() == 0


def test_simhash_banding_survives_sign_bit(spark):
    """A Hamming-1 pair differing only in bit 63 (sign bit of the int64
    fingerprint) must still collide in 3 of 4 chunks — signed div/mod band
    extraction silently lost these pairs for negative fingerprints."""
    from quickstart_streaming_agents_spark.operators.dedup import (
        simhash_pairs_from_fingerprints,
    )

    base = 0x1234_5678_9ABC_DEF0
    flipped = base ^ (1 << 63)  # differs only in the sign bit

    def to_i64(u):  # reinterpret uint64 as Spark LongType
        return u - (1 << 64) if u >= (1 << 63) else u

    fp = spark.createDataFrame(
        [(1, to_i64(base)), (2, to_i64(flipped))], "doc_id long, simhash long"
    )
    got = simhash_pairs_from_fingerprints(fp, max_hamming=3).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(1, 2, 1)]


# ---------------------------------------------------------------------------
# connected components (operators/components.py)
# ---------------------------------------------------------------------------

def _brute_components(pairs):
    """Driver-side union-find ground truth for small graphs."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    from quickstart_streaming_agents_spark.operators.components import (
        connected_components,
    )

    # chain (worst case for naive propagation), a triangle, a star, an
    # isolated pair — ids deliberately not in discovery order
    pairs = [(9, 8), (8, 7), (7, 6), (6, 5),        # chain 5..9
             (20, 21), (21, 22), (20, 22),           # triangle
             (30, 31), (30, 32), (30, 33),           # star
             (40, 41)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    # distributed contraction and single-task union-find finish must agree
    dist = {
        r.id: r.component
        for r in connected_components(df, local_threshold=0).collect()
    }
    local = {r.id: r.component for r in connected_components(df).collect()}
    assert dist == local == _brute_components(pairs)


def test_connected_components_converges_on_long_chain(spark):
    from quickstart_streaming_agents_spark.operators.components import (
        connected_components,
    )

    n = 200  # naive min-propagation needs ~n rounds; star contraction O(log n)
    pairs = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    out = connected_components(df, max_iter=12, local_threshold=0).collect()
    assert len(out) == n + 1
    assert all(r.component == 0 for r in out)


def test_connected_components_round_count_logarithmic(spark):
    """Pathological 10k-node path graph: star contraction must stay
    O(log n) rounds. Guard against a regression to per-hop min-propagation
    (which would need ~n rounds and turn a 100 TB dedup into a thousands-
    of-jobs driver loop). Bound: log2(n) + 4 slack rounds (+1 for the
    convergence-detection round that re-observes a fixed point)."""
    import math

    from quickstart_streaming_agents_spark.operators.components import (
        connected_components,
    )

    n = 10_000
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    stats: dict = {}
    out = connected_components(
        df, max_iter=25, local_threshold=0, stats=stats
    ).collect()
    assert len(out) == n + 1
    assert all(r.component == 0 for r in out)
    bound = int(math.log2(n)) + 5
    assert stats["rounds"] <= bound, (
        f"star contraction took {stats['rounds']} rounds on a {n}-node "
        f"path; expected <= {bound} (~log2 n)"
    )


def test_connected_components_local_finish_mid_iteration(spark):
    """A threshold between the initial and round-1 edge counts forces one
    distributed round, then the local union-find finish — both handoffs
    must produce the ground-truth labels."""
    from quickstart_streaming_agents_spark.operators.components import (
        connected_components,
    )

    n = 120
    pairs = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    out = {
        r.id: r.component
        for r in connected_components(df, local_threshold=n // 2).collect()
    }
    assert out == {i: 0 for i in range(n + 1)}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir= switches to durable checkpoint(); result identical
    to the localCheckpoint mode on the same chain graph."""
    from quickstart_streaming_agents_spark.operators.components import (
        connected_components,
    )

    pairs = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    local = {
        r.id: r.component
        for r in connected_components(df, local_threshold=0).collect()
    }
    durable = {
        r.id: r.component
        for r in connected_components(
            df, checkpoint_dir=str(tmp_path / "ckpt"), local_threshold=0
        ).collect()
    }
    assert local == durable == {i: 0 for i in range(61)}
    # reliable mode actually wrote checkpoint data
    import os
    assert any(files for _, _, files in os.walk(tmp_path / "ckpt"))


def test_dedup_clusters_decision_table(spark):
    from quickstart_streaming_agents_spark.operators.components import dedup_clusters

    pairs = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    rows = {r.id: r for r in dedup_clusters(df).collect()}
    assert rows[1].is_canonical and rows[1].cluster_size == 3
    assert not rows[3].is_canonical and rows[3].component == 1
    assert rows[10].is_canonical and rows[10].cluster_size == 2


def test_minhash_short_docs_emit_no_signature(spark):
    """Docs with fewer tokens than shingle_n used to get identical all-zero
    signatures — every pair of short docs became a 'perfect duplicate'."""
    from quickstart_streaming_agents_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, "ok"), (2, "thanks"), (3, "hello world"),
         (4, "a much longer document with plenty of distinct words inside"),
         (5, "a much longer document with plenty of distinct words inside")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(df, "doc_id", "text")
    assert {r.doc_id for r in sigs.collect()} == {4, 5}
    pairs = {(r.id_a, r.id_b) for r in
             minhash_lsh_pairs(df, "doc_id", "text").collect()}
    assert pairs == {(4, 5)}


def test_lsh_and_simhash_parameter_guards(spark):
    from quickstart_streaming_agents_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_pairs,
        simhash_pairs_from_fingerprints,
    )

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bands"):
        minhash_lsh_pairs(df, "doc_id", "text", num_hashes=64, bands=128)
    with pytest.raises(ValueError, match="Hamming"):
        simhash_pairs(df, "doc_id", "text", max_hamming=4)
    df2 = spark.createDataFrame([("u1", "a b c")], "doc_id string, text string")
    with pytest.raises(TypeError, match="integral id"):
        minhash_lsh_pairs(df2, "doc_id", "text")


def test_ngram_cap_cannot_inflate_jaccard(spark):
    """Sizes count the UNCAPPED shingle set, so dropping a hot shingle
    can only lower a pair's jaccard (recall loss), never raise it past
    the threshold (precision loss)."""
    from quickstart_streaming_agents_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    hot = "x y z"  # shared shingle made hot via many tiny docs containing it
    docs = [(i, f"{hot}") for i in range(10, 30)]
    # A: {hot, a-shingles...}; B shares only non-hot context with A partially
    docs += [(1, "x y z p q r"), (2, "p q r s t u v w")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.01,
                                     max_shingle_df=None).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.01,
                                     max_shingle_df=5).collect()
    }
    for pair, j in capped.items():
        assert j <= uncapped.get(pair, 0) + 1e-9, (pair, j, uncapped.get(pair))


def test_dedup_lines_first_occurrence_semantics(spark):
    """C4-style contract on a hand-built corpus: a duplicated line keeps
    only its smallest (doc_id, pos) occurrence; later docs lose it; docs
    reassemble in original order; a fully-duplicated doc drops out."""
    from quickstart_streaming_agents_spark.operators.dedup import dedup_lines

    rows = [
        (1, ["alpha", "beta", "alpha"]),   # in-doc dup: pos 2 copy dropped
        (2, ["beta", "gamma"]),            # beta already owned by doc 1
        (3, ["alpha", "beta"]),            # fully duplicated -> drops out
        (4, ["delta"]),
    ]
    df = spark.createDataFrame(rows, "doc_id int, lines array<string>")
    out = {
        r.doc_id: (r.text, r.n_lines_kept)
        for r in dedup_lines(df, "doc_id", "lines", sep="\n").collect()
    }
    assert out == {
        1: ("alpha\nbeta", 2),
        2: ("gamma", 1),
        4: ("delta", 1),
    }


def test_edit_distance_confirm_rejects_block_swaps(spark):
    """A block-swapped document shares almost all its 3-gram shingles
    (high Jaccard) yet sits a whole block away in edit distance — the
    precision case set-overlap alone gets wrong. The confirm tier must
    emit the candidate with a NULL distance and confirmed=false, while a
    genuinely-close pair confirms with its exact distance."""
    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.operators.dedup import (
        edit_distance_confirmed_pairs,
    )

    blk_a = " ".join(f"alpha{i}" for i in range(20))
    blk_b = " ".join(f"beta{i}" for i in range(20))
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{blk_a} {blk_b}"),
        Row(doc_id=2, text=f"{blk_b} {blk_a}"),      # swap: far in edits
        Row(doc_id=3, text=f"{blk_a} {blk_b} tail"),  # near: 5 edits
    ])
    out = {(r.id_a, r.id_b): r for r in edit_distance_confirmed_pairs(
        docs, "doc_id", "text", n=3, jaccard_floor=0.5, max_dist=10
    ).collect()}

    assert (1, 3) in out
    r13 = out[(1, 3)]
    assert r13.confirmed and r13.edit_distance == 5  # ' tail'

    assert (1, 2) in out  # candidate tier finds it...
    r12 = out[(1, 2)]
    assert not r12.confirmed  # ...confirm tier rejects it
    assert r12.edit_distance is None
    assert r12.jaccard >= 0.5


def test_prefix_filter_jaccard_matches_brute_force(spark):
    """The AllPairs prefix filter must find EXACTLY the brute-force
    threshold pairs (zero false negatives is the operator's whole
    contract vs the banding tiers)."""
    import itertools

    from quickstart_streaming_agents_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma delta epsilon eta",     # J high vs 1
        3: "alpha beta gamma delta epsilon zeta",    # identical to 1
        4: "one two three four five six seven",
        5: "one two three four five six eight",      # J high vs 4
        6: "totally different words here now folks",
        7: "aa",                                     # < n tokens: no set
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])

    def shingles(t, n=3):
        w = t.split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    want = {}
    for a, b in itertools.combinations(sorted(texts), 2):
        sa, sb = shingles(texts[a]), shingles(texts[b])
        if not sa or not sb:
            continue
        sh = len(sa & sb)
        if sh == 0:
            continue
        bp = sh * 10000 // (len(sa) + len(sb) - sh)
        if bp >= 6000:
            want[(a, b)] = bp
    assert want  # the fixture must actually exercise the threshold
    got = {(r.id_a, r.id_b): r.jaccard_bp
           for r in prefix_filter_jaccard_pairs(
               df, "doc_id", "text", threshold_bp=6000).collect()}
    assert got == want

    # token-set mode (gram_n=None): 1 and 3 are identical sets
    got_tok = {(r.id_a, r.id_b) for r in prefix_filter_jaccard_pairs(
        df, "doc_id", "text", gram_n=None, threshold_bp=9999).collect()}
    assert (1, 3) in got_tok

    import pytest

    with pytest.raises(ValueError, match="threshold_bp"):
        prefix_filter_jaccard_pairs(df, "doc_id", "text", threshold_bp=0)


def test_prefix_filter_candidate_pruning_actually_prunes(spark):
    """The prefix postings must be strictly smaller than the full
    postings (the operator's reason to exist) while still finding the
    planted near-dup pair."""
    from quickstart_streaming_agents_spark.operators.dedup import (
        _distinct_set_postings,
        prefix_filter_jaccard_pairs,
    )

    rows = [(i, f"shared common boiler plate w{i} x{i} y{i} z{i}")
            for i in range(20)]
    rows += [(100, "unique planted duplicate text body here"),
             (101, "unique planted duplicate text body here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b) for r in prefix_filter_jaccard_pairs(
        df, "doc_id", "text", threshold_bp=9000).collect()}
    assert got == {(100, 101)}
    full = _distinct_set_postings(df, "doc_id", "text", 3).count()
    assert full > 0


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc verbatim inside a 3x-longer wrapper: containment_bp
    ~10000 while Jaccard is ~1/3 — the asymmetric case the operator
    exists for. Also: threshold guard, shared-shingle exactness."""
    import pytest

    from quickstart_streaming_agents_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "the quick brown fox jumps over the lazy dog today"
    filler = " ".join(f"filler{i} pad{i} noise{i}" for i in range(8))
    rows = [(1, small), (2, filler + " " + small + " " + filler)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    [r] = containment_pairs(df, "doc_id", "text",
                            threshold_bp=9000).collect()
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment_bp == 10000  # every small shingle present
    # symmetric Jaccard at 0.6 misses it
    assert ngram_jaccard_pairs(df, "doc_id", "text",
                               threshold=0.6).count() == 0
    with pytest.raises(ValueError, match="threshold_bp"):
        containment_pairs(df, "doc_id", "text", threshold_bp=20000)


def test_minhash_calibration_signature_pass_runs_once(spark):
    """AQE-reuse sentinel (VERDICT r14 #4/#8): minhash_calibration's
    single-signature-pass claim rests on AQE RUNTIME stage reuse — the
    initial plan still prints one MapInPandas per consumer, so no static
    plan pin can catch a reuse regression. Count rows through the Python
    signature stage with an accumulator: one pass processes ~n_docs; a
    reuse regression restores the old 4x recompute (~4 * n_docs) and
    fails the upper bound loudly. Small slack absorbs a speculative or
    retried task."""
    from quickstart_streaming_agents_spark.operators import dedup
    from quickstart_streaming_agents_spark.queries import QUERIES

    ship_package(spark)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    acc = spark.sparkContext.accumulator(0)
    dedup.SIG_PASS_ROWS = acc
    try:
        df = QUERIES["minhash_calibration"](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
    finally:
        dedup.SIG_PASS_ROWS = None
    assert acc.value >= n_docs, (
        f"signature stage saw {acc.value} rows < {n_docs} docs")
    assert acc.value <= 1.5 * n_docs, (
        f"signature stage processed {acc.value} rows for {n_docs} docs — "
        "AQE exchange reuse regressed (per-consumer recompute is back)")
