"""BPE tokenizer learning — distributed byte-pair-encoding over a corpus.

Beyond-reference surface: a training-data platform that measures token
counts (functions/text.subword_token_count) eventually needs to LEARN
the tokenizer from its own corpus. Classic BPE (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
public recipe GPT-2's tokenizer builds on) alternates two steps:

1. count the frequency of every adjacent symbol pair across the corpus,
2. merge the most frequent pair everywhere,

starting from characters within whitespace words. Step 1 is the
data-parallel heart and is exposed standalone as ``pair_frequencies``
(oracle-checkable); the merge loop drives it.

Spark-first shape: the corpus collapses to a (word, freq) VOCABULARY
first — one shuffle over words, after which every iteration works on
|vocab| rows, not |corpus| rows (the classic trick: pair counts are
word-internal, so a corpus of billions of tokens becomes a vocab of
millions of rows weighted by frequency). Pair extraction is an in-task
explode; the per-iteration pair count is one partial-agg shuffle of
(pair, weight) rows; the merge rewrite is a JVM ``aggregate`` fold over
each word's symbol array (greedy left-to-right, the BPE contract) — no
Python row code anywhere. The driver's only action per iteration is the
argmax row (deterministic lexicographic tie-break).

At 100 TB: the vocab build is the only corpus-sized shuffle. Each merge
iteration then costs two narrow vocab-sized stages; learning the usual
30-50k merges means that many driver round-trips, so real runs batch on
top of this (merge the top-k non-overlapping pairs per round — the
SentencePiece-style speedup, a small documented deviation from classic
BPE). This module implements the classic exact loop; a batched round is
a composition of the same two primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(w, freq) over whitespace words — the one corpus-sized shuffle."""
    words = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    return words.groupBy("w").agg(F.count("*").alias("freq"))


def _char_symbols(col):
    """Word → array of single-character symbols (pure-Column JVM
    transform; works on any Column expression, not just named columns)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.substring(c, i, F.lit(1)),
    )


def _adjacent_pairs(syms_col: str):
    """Symbol array → array of (left_sym, right_sym) structs."""
    return F.expr(
        f"CASE WHEN size({syms_col}) >= 2 THEN "
        f"transform(sequence(1, size({syms_col}) - 1), "
        f"i -> struct(element_at({syms_col}, i) AS left_sym, "
        f"element_at({syms_col}, i + 1) AS right_sym)) "
        f"ELSE array() END"
    )


def pair_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies (BPE step 1 at the
    char level): ``left_sym``, ``right_sym``, ``pair_freq``.

    Two shuffles: the word-vocabulary aggregate, then the (pair, weight)
    aggregate — both with map-side partial combine.
    """
    vocab = _word_vocab(df, text_col).withColumn("syms", _char_symbols("w"))
    pairs = vocab.select(
        "freq", F.explode(_adjacent_pairs("syms")).alias("p")
    )
    return (
        pairs.groupBy(
            F.col("p.left_sym").alias("left_sym"),
            F.col("p.right_sym").alias("right_sym"),
        )
        .agg(F.sum("freq").cast("long").alias("pair_freq"))
    )


def _merge_fold():
    """Greedy left-to-right merge of adjacent (a, b) → a+b in a symbol
    array, as a pure-Column aggregate fold (symbols are compared as
    Column literals — no SQL string splicing, arbitrary symbols safe)."""

    def fold(syms, a_lit, b_lit):
        return F.aggregate(
            syms,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == a_lit)
                & (x == b_lit),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(a_lit, b_lit)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    return fold


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns them in
    order. Ties break lexicographically on (left, right) so the result
    is deterministic across runs and cluster layouts.

    Each iteration runs two narrow vocab-sized Spark stages and collects
    exactly one row. Stops early when no pair reaches ``min_pair_freq``.
    """
    vocab = (
        _word_vocab(df, text_col)
        .withColumn("syms", _char_symbols("w"))
        .select("freq", "syms")
        .persist()
    )
    fold = _merge_fold()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(num_merges):
            top = (
                vocab.select("freq", F.explode(_adjacent_pairs("syms")).alias("p"))
                .groupBy(
                    F.col("p.left_sym").alias("a"),
                    F.col("p.right_sym").alias("b"),
                )
                .agg(F.sum("freq").alias("pf"))
                .orderBy(F.col("pf").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not top or top[0].pf < min_pair_freq:
                break
            a, b = top[0].a, top[0].b
            merges.append((a, b))
            nxt = vocab.withColumn(
                "syms", fold(F.col("syms"), F.lit(a), F.lit(b))
            ).persist()
            nxt.count()  # materialize before dropping the parent
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


def bpe_segment(merges: list[tuple[str, str]]):
    """Column function applying learned merges in order to a word column —
    the encode step, chained JVM folds, usable in any batch or streaming
    projection."""
    fold = _merge_fold()

    def seg(word_col):
        syms = _char_symbols(word_col)
        for a, b in merges:
            syms = fold(syms, F.lit(a), F.lit(b))
        return syms

    return seg
