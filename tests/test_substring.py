"""Repeated-substring span detection (operators/substring.py).

Oracle parity (test_parity.py) pins the md5 path on the fixture; these
pin the semantics on constructed corpora and the xxhash64 ≡ md5
equivalence of the span output.
"""

from __future__ import annotations

import pytest

from quickstart_streaming_agents_spark.operators.substring import (
    duplicate_spans,
    strip_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_windows) for r in df.collect()
    )


def test_shared_run_found_in_both_docs(spark):
    shared = " ".join(f"tok{i}" for i in range(10))
    docs = _docs(
        spark,
        [
            (1, f"aa bb {shared} cc dd"),
            (2, f"xx {shared} yy zz ww"),
            (3, "totally unrelated words only here once each never repeated"),
        ],
    )
    got = _spans(duplicate_spans(docs, k=10, min_df=2))
    # the 10-token shared run starts at offset 2 in doc 1, offset 1 in doc 2
    assert got == [(1, 2, 12, 1), (2, 1, 11, 1)]


def test_overlapping_windows_merge_to_one_span(spark):
    shared = " ".join(f"tok{i}" for i in range(12))  # 12 tokens, k=10 → 3 windows
    docs = _docs(
        spark,
        [(1, f"{shared} tail word"), (2, f"lead {shared} more words here")],
    )
    got = _spans(duplicate_spans(docs, k=10, min_df=2))
    assert got == [(1, 0, 12, 3), (2, 1, 13, 3)]


def test_within_document_repeat_counts(spark):
    run = " ".join(f"w{i}" for i in range(10))
    docs = _docs(
        spark,
        [(1, f"{run} break0 break1 break2 {run}"),
         (2, "nothing shared with anything in this one at all really")],
    )
    got = _spans(duplicate_spans(docs, k=10, min_df=2))
    assert got == [(1, 0, 10, 1), (1, 13, 23, 1)]


def test_xxhash64_path_matches_md5_path(spark):
    shared = " ".join(f"t{i}" for i in range(15))
    docs = _docs(
        spark,
        [(i, f"doc{i} opens {shared} and closes {i}") for i in range(6)],
    )
    a = _spans(duplicate_spans(docs, k=8, gram_hash="xxhash64"))
    b = _spans(duplicate_spans(docs, k=8, gram_hash="md5"))
    assert a == b and len(a) > 0


def test_rejects_bad_params(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        duplicate_spans(docs, k=0)
    with pytest.raises(ValueError):
        duplicate_spans(docs, gram_hash="sha1")


def _clean(df):
    return {r.doc_id: (r.clean_text, r.n_tokens_removed) for r in df.collect()}


def test_strip_keeps_globally_first_occurrence(spark):
    shared = " ".join(f"tok{i}" for i in range(10))
    docs = _docs(
        spark,
        [
            (1, f"aa bb {shared} cc dd"),
            (2, f"xx {shared} yy zz ww"),
            (3, "unique words only here once each never repeated at all"),
        ],
    )
    got = _clean(strip_duplicate_spans(docs, k=10))
    assert got[1] == (f"aa bb {shared} cc dd", 0)  # canonical copy intact
    assert got[2] == ("xx yy zz ww", 10)
    assert got[3][1] == 0
    assert len(got) == 3  # every doc exactly once


def test_strip_within_doc_repeat_keeps_first(spark):
    run = " ".join(f"w{i}" for i in range(10))
    docs = _docs(spark, [(1, f"{run} mid0 mid1 mid2 {run}"),
                         (2, "none of these words repeat anywhere at all today")])
    got = _clean(strip_duplicate_spans(docs, k=10))
    assert got[1] == (f"{run} mid0 mid1 mid2", 10)


def _model_spans(corpus, k):
    """Pure-Python model: window hashes (the gram text itself — collision-
    free), frequency filter, interval merge."""
    from collections import Counter

    wins = []
    for doc_id, text in corpus:
        toks = text.split()
        for s in range(len(toks) - k + 1):
            wins.append((doc_id, s, " ".join(toks[s : s + k])))
    freq = Counter(g for _, _, g in wins)
    spans = []
    for doc_id, _ in corpus:
        hits = sorted(s for d, s, g in wins if d == doc_id and freq[g] >= 2)
        cur = None
        for s in hits:
            if cur and s <= cur[1]:
                cur[1] = max(cur[1], s + k)
                cur[2] += 1
            else:
                if cur:
                    spans.append((doc_id, cur[0], cur[1], cur[2]))
                cur = [s, s + k, 1]
        if cur:
            spans.append((doc_id, cur[0], cur[1], cur[2]))
    return sorted(spans)


@pytest.mark.parametrize("seed", [3, 11])
def test_spans_match_python_model_on_random_corpus(spark, seed):
    import random

    rng = random.Random(seed)
    # small vocab forces plenty of genuine repeats
    corpus = [
        (i, " ".join(rng.choice("a b c d e".split()) for _ in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    got = _spans(duplicate_spans(_docs(spark, corpus), k=5, min_df=2))
    assert got == _model_spans(corpus, 5)


def test_strip_hash_paths_agree(spark):
    shared = " ".join(f"t{i}" for i in range(15))
    docs = _docs(
        spark,
        [(i, f"doc{i} opens {shared} and closes {i}") for i in range(5)],
    )
    a = _clean(strip_duplicate_spans(docs, k=8, gram_hash="xxhash64"))
    b = _clean(strip_duplicate_spans(docs, k=8, gram_hash="md5"))
    assert a == b
