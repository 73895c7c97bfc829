"""Chunking, repetition stats, and PII redaction unit semantics."""

from __future__ import annotations

from pyspark.sql import Row

from quickstart_streaming_agents_spark.functions.text import (
    pii_counts,
    pii_redact,
    repetition_stats,
)
from quickstart_streaming_agents_spark.operators.chunking import chunk_documents


def test_chunk_boundaries_and_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(words))])
    rows = sorted(
        chunk_documents(df, ["doc_id"], chunk_tokens=4, overlap_tokens=2).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride 2 over 10 words -> starts 0,2,4,6,8
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0].chunk == "w0 w1 w2 w3"
    assert rows[1].chunk == "w2 w3 w4 w5"  # 2-token overlap with chunk 0
    assert rows[4].chunk == "w8 w9"  # short tail
    assert rows[4].n_chunk_tokens == 2


def test_chunk_short_doc_single_chunk(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="only three words")])
    rows = chunk_documents(df, ["doc_id"], chunk_tokens=64, overlap_tokens=16).collect()
    assert len(rows) == 1 and rows[0].chunk == "only three words"


def test_chunking_is_map_only(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    plan = (
        chunk_documents(df, ["doc_id"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam"),  # 1 distinct / 4 words
            Row(doc_id=2, text="all words here differ"),
            Row(doc_id=3, text="solo"),
        ]
    )
    out = {r.doc_id: r for r in repetition_stats(df, ["doc_id"]).collect()}
    assert out[1].dup_word_frac == 0.75
    assert out[1].top_bigram_frac == 1.0  # every bigram is "spam spam"
    assert out[2].dup_word_frac == 0.0
    assert out[2].top_bigram_frac == 0.333333  # 3 distinct bigrams, max count 1 (round 6)
    assert out[3].top_bigram_frac == 0.0  # <2 words -> no bigrams


def test_pii_redact_and_counts(spark):
    txt = "mail a.b+c@ex-ample.org, call +44-555-1234, host 192.168.0.1 end"
    df = spark.createDataFrame([Row(t=txt)])
    counts = pii_counts("t")
    row = df.select(
        pii_redact("t").alias("red"),
        counts["email"].alias("e"),
        counts["phone"].alias("p"),
        counts["ip"].alias("i"),
    ).first()
    assert row.red == "mail <EMAIL>, call <PHONE>, host <IP> end"
    assert (row.e, row.p, row.i) == (1, 1, 1)


def test_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([Row(t="no pii here, just version 1.2 notes")])
    assert df.select(pii_redact("t").alias("r")).first().r == (
        "no pii here, just version 1.2 notes"
    )


def test_gap_fill_locf_semantics(spark):
    import datetime

    from quickstart_streaming_agents_spark.operators.gapfill import gap_fill

    def ts(h):
        return datetime.datetime(2024, 1, 1, h)

    df = spark.createDataFrame(
        [Row(k="a", b=ts(0), v=10, w=1.5), Row(k="a", b=ts(3), v=30, w=None),
         Row(k="b", b=ts(1), v=99, w=9.0)]
    )
    out = {
        (r.k, r.b.hour): (r.v, r.w, r.is_gap)
        for r in gap_fill(df, ["k"], "b", ["v", "w"], "1 hour").collect()
    }
    # observed rows keep their values (w=None stays None — atomic struct,
    # NOT torn from the previous observation)
    assert out[("a", 0)] == (10, 1.5, False)
    assert out[("a", 3)] == (30, None, False)
    # synthesized buckets carry the last observation forward
    assert out[("a", 1)] == (10, 1.5, True)
    assert out[("a", 2)] == (10, 1.5, True)
    # key b has a single observation -> single-row span, no gaps
    assert out[("b", 1)] == (99, 9.0, False)
    assert len(out) == 5


def test_chunking_skips_null_and_blank_docs(spark):
    from quickstart_streaming_agents_spark.operators.chunking import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(1, "one two three"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    got = chunk_documents(df, id_cols=["doc_id"], chunk_tokens=4,
                          overlap_tokens=0).collect()
    assert {r.doc_id for r in got} == {1}


def test_span_corruption_reconstructs_original_text(spark):
    """The T5 denoising invariant: substituting each <extra_id_j> in
    `inputs` with its span from `targets` must reproduce the original
    (whitespace-normalized) text exactly, for every document."""
    import re

    from quickstart_streaming_agents_spark.queries import QUERIES
    from quickstart_streaming_agents_spark.sources.parquet import load_table
    from tests.conftest import SF_DIR

    out = {r.doc_id: r for r in QUERIES["span_corruption_pairs"](
        spark, SF_DIR).collect()}
    docs = {r.doc_id: " ".join(r.text.split())
            for r in load_table(spark, SF_DIR, "documents")
            .select("doc_id", "text").collect()}
    assert set(out) == set(docs)
    n_with_corruption = 0
    for d, r in out.items():
        # parse targets: '<extra_id_0> span0 ... <extra_id_m>'
        parts = re.split(r"<extra_id_(\d+)>", r.targets)
        spans = {}
        for i in range(1, len(parts) - 2, 2):
            spans[int(parts[i])] = parts[i + 1].strip()
        assert int(parts[-2]) == r.n_corrupted  # closing sentinel
        rebuilt = re.sub(
            r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], r.inputs
        )
        rebuilt = " ".join(rebuilt.split())
        assert rebuilt == docs[d], d
        if r.n_corrupted:
            n_with_corruption += 1
    assert 0 < n_with_corruption < len(out)  # both shapes occur


def test_badwords_filter_token_exact(spark):
    """Blocklist matching must be token-exact: a word CONTAINING a
    blocked word as a substring must not trip the filter, and counts
    are distinct-word hits, not occurrences."""
    import tempfile

    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.queries import QUERIES

    rows = [
        Row(doc_id=1, text="a dup appeared and another dup", lang="en",
            source="s", n_chars=1),
        Row(doc_id=2, text="duplicate spillway leaky classes", lang="en",
            source="s", n_chars=1),  # substrings only -> kept
        Row(doc_id=3, text="spill and leak and dup", lang="en",
            source="s", n_chars=1),
        Row(doc_id=4, text="perfectly clean text", lang="en",
            source="s", n_chars=1),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in QUERIES["badwords_filter"](
            spark, d).collect()}
    assert out[1].n_blocked_words == 1 and not out[1].kept  # distinct hit
    assert out[2].n_blocked_words == 0 and out[2].kept      # substrings
    assert out[3].n_blocked_words == 3 and not out[3].kept
    assert out[4].kept


def test_pagerank_int_matches_python_recurrence(spark):
    """The ACTUAL Spark operator must equal an independent pure-Python
    recurrence on a fixed seeded graph — exact integer equality (the
    hypothesis suite pins order-independence of the recurrence itself;
    this pins the operator's joins/div/agg against it)."""
    import random

    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.operators.components import (
        pagerank_int,
    )

    rng = random.Random(42)
    n = 40
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    scale, d, iters = 1_000_000, 85, 3
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: scale for v in range(n)}
    for _ in range(iters):
        contrib = {v: 0 for v in range(n)}
        for s, t in edges:
            contrib[t] += r[s] // deg[s]
        r = {v: (100 - d) * scale // 100 + (d * contrib[v]) // 100
             for v in range(n)}

    edf = spark.createDataFrame([Row(src=s, dst=t) for s, t in edges])
    ndf = spark.createDataFrame([Row(node=v) for v in range(n)])
    got = {row.node: row.rank_scaled
           for row in pagerank_int(edf, ndf, iters=iters).collect()}
    assert got == r
