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

from quickstart_streaming_agents_spark.functions.text import tokens


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(w, freq) over whitespace words — the one corpus-sized shuffle.
    Tokenization is the canonical functions.text.tokens()."""
    words = df.select(F.explode(tokens(text_col)).alias("w")).filter(
        F.col("w") != ""
    )
    return words.groupBy("w").agg(F.count("*").alias("freq"))


def _char_symbols(col):
    """Word → array of single-character symbols (pure-Column JVM
    transform; works on any Column expression, not just named columns)."""
    c = F.col(col) if isinstance(col, str) else col
    # sequence(1, 0) would DESCEND to [1, 0] and emit two phantom ''
    # symbols — empty input must produce an empty symbol array
    return F.when(
        F.length(c) == 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(c)),
            lambda i: F.substring(c, i, F.lit(1)),
        )
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


def _pair_counts(vocab: DataFrame, left: str, right: str, freq: str) -> DataFrame:
    """(left, right, freq) aggregate over a (freq, syms) vocabulary — the
    single shape both the standalone op and the merge loop count with."""
    return (
        vocab.select("freq", F.explode(_adjacent_pairs("syms")).alias("p"))
        .groupBy(
            F.col("p.left_sym").alias(left), F.col("p.right_sym").alias(right)
        )
        .agg(F.sum("freq").alias(freq))
    )


def pair_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies (BPE step 1 at the
    char level): ``left_sym``, ``right_sym``, ``pair_freq``.

    Two shuffles: the word-vocabulary aggregate, then the (pair, weight)
    aggregate — both with map-side partial combine.
    """
    vocab = _word_vocab(df, text_col).withColumn("syms", _char_symbols("w"))
    return _pair_counts(vocab, "left_sym", "right_sym", "pair_freq").withColumn(
        "pair_freq", F.col("pair_freq").cast("long")
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
    # localCheckpoint (eager) both caches the iteration state AND
    # truncates lineage — without it the plan stacks one fold per merge
    # and per-iteration analysis cost grows with the merge count.
    vocab = (
        _word_vocab(df, text_col)
        .withColumn("syms", _char_symbols("w"))
        .select("freq", "syms")
        .localCheckpoint()
    )
    fold = _merge_fold()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(vocab, "a", "b", "pf")
            .orderBy(F.col("pf").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0].pf < min_pair_freq:
            break
        a, b = top[0].a, top[0].b
        merges.append((a, b))
        vocab = vocab.withColumn(
            "syms", fold(F.col("syms"), F.lit(a), F.lit(b))
        ).localCheckpoint()
    return merges


def bpe_segment(merges: list[tuple[str, str]]):
    """Column function applying learned merges in order to a word column —
    the encode step as chained JVM folds, usable in batch or streaming
    projections for MODEST merge lists (each merge nests one aggregate()
    in the expression tree, so a few hundred is the practical ceiling
    before Catalyst analysis and codegen costs bite). Encoding with a
    full 30-50k-merge vocabulary belongs in a broadcast merge-rank map
    applied by an Arrow-batched UDF, not a column expression."""
    fold = _merge_fold()

    def seg(word_col):
        syms = _char_symbols(word_col)
        for a, b in merges:
            syms = fold(syms, F.lit(a), F.lit(b))
        return syms

    return seg
