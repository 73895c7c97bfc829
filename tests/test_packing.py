"""Sequence packing invariants (operators/packing.py).

The oracle parity test (test_parity.py) proves the exact assignment;
these pin the structural contract: conservation of tokens, exactly-full
interior sequences, contiguous fragments, and bucket-count determinism
of the per-bucket layout.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.text import token_count
from quickstart_streaming_agents_spark.operators.packing import pack_sequences
from quickstart_streaming_agents_spark.sources.parquet import load_table
from tests.conftest import SF_DIR

SEQ_LEN = 64


@pytest.fixture(scope="module")
def packed(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = pack_sequences(docs, seq_len=SEQ_LEN, num_buckets=4).persist()
    yield docs, out
    out.unpersist()


def test_tokens_conserved_per_document(packed):
    docs, out = packed
    expect = docs.select(
        "doc_id", token_count("text").cast("long").alias("n_expect")
    ).filter(F.col("n_expect") > 0)
    got = out.groupBy("doc_id").agg(F.sum("n_seq_tokens").alias("n_got"))
    assert expect.join(got, "doc_id").filter("n_expect != n_got").count() == 0
    assert expect.count() == got.count()


def test_interior_sequences_exactly_full(packed):
    _, out = packed
    per_seq = out.groupBy("bucket", "seq_id").agg(
        F.sum("n_seq_tokens").alias("filled")
    )
    last = out.groupBy("bucket").agg(F.max("seq_id").alias("last_seq"))
    interior = per_seq.join(last, "bucket").filter("seq_id < last_seq")
    assert interior.filter(F.col("filled") != SEQ_LEN).count() == 0
    # the tail sequence is the only one allowed to be short
    tail = per_seq.join(last, "bucket").filter("seq_id = last_seq")
    assert tail.filter(F.col("filled") > SEQ_LEN).count() == 0


def test_fragments_contiguous_within_document(packed):
    """A doc split over k sequences covers [0, n) without gaps: fragment
    doc offsets chain (next.doc_tok_start == prev.doc_tok_start + prev.n)
    and consecutive fragments land in consecutive sequences."""
    _, out = packed
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("seq_id")
    chained = out.select(
        "doc_id", "seq_id", "doc_tok_start", "n_seq_tokens",
        F.lag("doc_tok_start").over(w).alias("p_start"),
        F.lag("n_seq_tokens").over(w).alias("p_n"),
        F.lag("seq_id").over(w).alias("p_seq"),
    ).filter(F.col("p_start").isNotNull())
    assert (
        chained.filter(
            (F.col("doc_tok_start") != F.col("p_start") + F.col("p_n"))
            | (F.col("seq_id") != F.col("p_seq") + 1)
        ).count()
        == 0
    )
    assert out.filter(
        (F.col("seq_tok_start") < 0)
        | (F.col("seq_tok_start") + F.col("n_seq_tokens") > SEQ_LEN)
    ).count() == 0


def test_first_fragment_starts_at_zero(packed):
    _, out = packed
    firsts = out.groupBy("doc_id").agg(
        F.min("doc_tok_start").alias("first_off")
    )
    assert firsts.filter("first_off != 0").count() == 0


def _model_pack(docs, seq_len, num_buckets):
    """Pure-Python reference layout: per bucket, docs in id order, token
    stream cut every seq_len; one (doc, seq) fragment row per overlap."""
    rows = []
    for b in range(num_buckets):
        off = 0
        for doc_id, n in sorted(d for d in docs if d[0] % num_buckets == b):
            if n <= 0:
                continue
            start, end = off, off + n
            for seq in range(start // seq_len, (end - 1) // seq_len + 1):
                lo, hi = max(start, seq * seq_len), min(end, (seq + 1) * seq_len)
                rows.append((doc_id, b, seq, lo - start, lo - seq * seq_len, hi - lo))
            off = end
    return sorted(rows)


@pytest.mark.parametrize("seed,seq_len,buckets", [(7, 16, 3), (21, 50, 5)])
def test_matches_python_model_on_random_corpora(spark, seed, seq_len, buckets):
    import random

    rng = random.Random(seed)
    docs = [(i, rng.randint(1, 120)) for i in range(200)]
    df = spark.createDataFrame(
        [(i, " ".join("w" for _ in range(n))) for i, n in docs],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in pack_sequences(
            df, seq_len=seq_len, num_buckets=buckets
        ).collect()
    )
    assert got == _model_pack(docs, seq_len, buckets)


def test_rejects_bad_params(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, num_buckets=0)


def test_blank_documents_occupy_no_slots(spark):
    """'' and whitespace-only docs must not pack a phantom token (split('')
    yields [''], which naive size() counts as 1)."""
    df = spark.createDataFrame(
        [(0, "one two three"), (1, ""), (2, "   "), (3, "four five")],
        "doc_id long, text string",
    )
    out = pack_sequences(df, seq_len=4, num_buckets=1).collect()
    assert {r.doc_id for r in out} == {0, 3}
    # doc 3 starts right after doc 0's 3 tokens — no gap from docs 1/2 —
    # so its 2 tokens straddle the seq boundary: [3,4) of seq 0, [4,5) → 0 of seq 1
    frag3 = {(r.seq_id, r.seq_tok_start, r.n_seq_tokens)
             for r in out if r.doc_id == 3}
    assert frag3 == {(0, 3, 1), (1, 0, 1)}
