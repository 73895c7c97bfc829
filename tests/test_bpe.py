"""BPE tokenizer learning (operators/bpe.py).

Oracle parity (test_parity.py) pins pair_frequencies on the fixture;
these pin the merge loop against a pure-Python reference BPE (classic
Sennrich et al. greedy algorithm) and the encode step's round-trip.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.operators.bpe import (
    bpe_segment,
    learn_bpe_merges,
    pair_frequencies,
)

CORPUS = "low low low lower lower newest newest newest newest widest widest"


def _ref_bpe(corpus: str, n: int, min_freq: int = 2):
    """Reference BPE: max pair frequency, ties to the lexicographically
    smallest (a, b); greedy left-to-right merge."""
    vocab = {
        tuple(w): f for w, f in Counter(corpus.split()).items()
    }
    merges = []
    for _ in range(n):
        pf = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pf[(syms[i], syms[i + 1])] += f
        if not pf:
            break
        mx = max(pf.values())
        if mx < min_freq:
            break
        a, b = sorted(p for p, f in pf.items() if f == mx)[0]
        merges.append((a, b))
        nv = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    return merges


def test_learned_merges_match_reference(spark):
    df = spark.createDataFrame([(1, CORPUS)], "id long, text string")
    assert learn_bpe_merges(df, num_merges=6) == _ref_bpe(CORPUS, 6)


def test_merges_match_reference_on_random_corpus(spark):
    import random

    rng = random.Random(13)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(2, 6)))
             for _ in range(30)]
    corpus = " ".join(rng.choice(words) for _ in range(200))
    df = spark.createDataFrame([(1, corpus)], "id long, text string")
    assert learn_bpe_merges(df, num_merges=8) == _ref_bpe(corpus, 8)


def test_pair_frequencies_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "ab ab abc")], "id long, text string"
    )
    got = {
        (r.left_sym, r.right_sym): r.pair_freq
        for r in pair_frequencies(df).collect()
    }
    # 'ab' freq 2 contributes (a,b)x2; 'abc' adds (a,b) and (b,c)
    assert got == {("a", "b"): 3, ("b", "c"): 1}


def test_segment_reconstructs_word(spark):
    df = spark.createDataFrame([(1, CORPUS)], "id long, text string")
    merges = learn_bpe_merges(df, num_merges=6)
    seg = bpe_segment(merges)
    out = spark.range(1).select(
        seg(F.lit("newest")).alias("s"), seg(F.lit("lowest")).alias("t")
    ).first()
    assert "".join(out.s) == "newest"  # lossless segmentation
    assert "".join(out.t) == "lowest"
    assert len(out.s) < len("newest")  # merges actually applied


def test_segment_empty_string_yields_empty_array(spark):
    """sequence(1, 0) descends in Spark — '' must not become ['', '']."""
    seg = bpe_segment([("a", "b")])
    out = spark.range(1).select(seg(F.lit("")).alias("s")).first().s
    assert out == []


def test_early_stop_below_min_freq(spark):
    df = spark.createDataFrame(
        [(1, "ab cd ef gh ij")], "id long, text string"
    )
    # every adjacent pair occurs exactly once < min_pair_freq=2 → no merges
    assert learn_bpe_merges(df, num_merges=5) == []


def test_driver_local_learner_matches_distributed_loop(spark):
    """The round-5 driver-local merge loop (2 Spark jobs total) must
    produce exactly the merges of the round-4 fully-distributed loop on
    the same corpus — same argmax, same tie-break, same greedy rewrite."""
    from quickstart_streaming_agents_spark.operators.bpe import (
        _learn_bpe_merges_distributed,
    )

    import random

    rng = random.Random(99)
    words = ["".join(rng.choice("abcde") for _ in range(rng.randint(2, 7)))
             for _ in range(40)]
    corpus = " ".join(rng.choice(words) for _ in range(300))
    df = spark.createDataFrame([(1, corpus)], "id long, text string")
    assert (
        learn_bpe_merges(df, num_merges=12)
        == _learn_bpe_merges_distributed(df, num_merges=12)
    )


def test_vocab_guard_fails_loudly(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "aa bb cc dd ee")], "id long, text string"
    )
    with pytest.raises(ValueError, match="max_vocab_rows"):
        learn_bpe_merges(df, num_merges=2, max_vocab_rows=3)


def test_many_merges_run_in_constant_spark_jobs(spark):
    """200 merges on a long corpus must not take 200 Spark jobs — the
    loop is driver-local after one collect. Proxy check: wall time stays
    far under what 200 scheduler round-trips would cost, and the merges
    prefix-match a smaller run (the loop is deterministic/greedy)."""
    import random

    rng = random.Random(7)
    words = ["".join(rng.choice("abcdefgh") for _ in range(rng.randint(3, 9)))
             for _ in range(300)]
    corpus = " ".join(rng.choice(words) for _ in range(3000))
    df = spark.createDataFrame([(1, corpus)], "id long, text string")
    big = learn_bpe_merges(df, num_merges=200, min_pair_freq=1)
    small = learn_bpe_merges(df, num_merges=50, min_pair_freq=1)
    assert big[:50] == small
    assert len(big) > 50


def test_bpe_encode_sql_fold_matches_merge_word():
    """The DuckDB list_reduce fold used by the bpe_encode oracle must be
    the exact greedy left-to-right semantics of _merge_word (and thus of
    the JVM _merge_fold), including overlap cases (aa on aaa, chained
    merges re-matching a freshly merged left symbol)."""
    import duckdb

    from quickstart_streaming_agents_spark.operators.bpe import _merge_word
    from quickstart_streaming_agents_spark.queries import (
        _BPE_ENCODE_MERGES,
        _bpe_fold_sql,
    )

    words = [
        "the", "spark", "data", "ththth", "aaa", "spa", "spark",
        "thespa", "dada", "x", "tth", "hth", "sthe", "adat",
    ]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT w, {_bpe_fold_sql()} AS syms "
        "FROM (SELECT unnest(?) AS w)", [words]
    ).fetchall()
    con.close()
    for w, syms in rows:
        ref = list(w)
        for a, b in _BPE_ENCODE_MERGES:
            ref = _merge_word(ref, a, b)
        assert syms == ref, (w, syms, ref)
