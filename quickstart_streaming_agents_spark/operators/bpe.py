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

At 100 TB: the vocab build is the only corpus-sized shuffle. The merge
loop then runs DRIVER-LOCAL over the collected vocabulary (bounded by
``max_vocab_rows``, guarded) with incrementally maintained pair counts —
2 Spark jobs total regardless of merge count, exactly the classic
Sennrich et al. learner. The fully-distributed per-merge loop is kept
as ``_learn_bpe_merges_distributed`` for equivalence testing and for a
vocabulary too large to collect.
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


def _merge_word(w: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right (a, b) → a+b merge — the exact semantics of
    the JVM ``_merge_fold`` (a freshly merged symbol can immediately be
    the left side of the next match, never re-split)."""
    out: list[str] = []
    ab = a + b
    for x in w:
        if out and out[-1] == a and x == b:
            out[-1] = ab
        else:
            out.append(x)
    return out


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_pair_freq: int = 2,
    max_vocab_rows: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns them in
    order. Ties break lexicographically on (left, right) so the result
    is deterministic across runs and cluster layouts.

    Scale shape: the corpus-sized work is ONE distributed shuffle (the
    word-vocabulary aggregate). The collapsed vocab is tiny relative to
    the corpus — bounded by distinct whitespace words, in practice a few
    million rows for a 100 TB text corpus — so it is collected ONCE and
    the merge loop runs driver-local with incrementally maintained pair
    counts (the classic Sennrich et al. 2016 learner). Total Spark jobs:
    2 (count guard + collect), independent of ``num_merges`` — the
    round-4 per-merge driver round-trip (32k merges = 32k Spark jobs of
    pure scheduler overhead) is gone. ``max_vocab_rows`` fails loudly if
    the vocabulary exceeds the driver budget (≈200 bytes/row → ~1 GB at
    the default bound); raise it deliberately or pre-filter rare words.

    Stops early when no pair reaches ``min_pair_freq``.
    """
    from collections import Counter, defaultdict

    # persist: the guard count and the collect would otherwise each execute
    # the corpus-sized vocabulary shuffle — the dominant cost at scale
    vocab_df = _word_vocab(df, text_col).persist()
    try:
        n_rows = vocab_df.count()
        if n_rows > max_vocab_rows:
            raise ValueError(
                f"BPE word vocabulary has {n_rows} rows > max_vocab_rows="
                f"{max_vocab_rows}; the driver-local merge loop would exceed "
                "its memory budget. Pre-filter rare words (HAVING freq >= k) "
                "or raise max_vocab_rows explicitly."
            )
        rows = vocab_df.collect()
    finally:
        vocab_df.unpersist()

    words: list[list[str]] = [list(r.w) for r in rows]
    freqs: list[int] = [r.freq for r in rows]
    pair_counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, w in enumerate(words):
        f = freqs[i]
        for p in zip(w, w[1:]):
            pair_counts[p] += f
            where[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        (a, b), best = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best < min_pair_freq:
            break
        merges.append((a, b))
        for i in sorted(where[(a, b)]):
            old, f = words[i], freqs[i]
            new = _merge_word(old, a, b)
            words[i] = new
            old_p = Counter(zip(old, old[1:]))
            new_p = Counter(zip(new, new[1:]))
            for p in old_p.keys() - new_p.keys():
                where[p].discard(i)
            for p in new_p.keys() - old_p.keys():
                where[p].add(i)
            for p in old_p.keys() | new_p.keys():
                delta = (new_p[p] - old_p[p]) * f
                if delta:
                    pair_counts[p] += delta
                    if pair_counts[p] <= 0:
                        del pair_counts[p]
        pair_counts.pop((a, b), None)
        where.pop((a, b), None)
    return merges


def _learn_bpe_merges_distributed(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Round-4 fully-distributed merge loop, kept as the equivalence
    oracle for the driver-local learner (tests/test_bpe.py) and for the
    (pathological) case of a vocabulary too large to collect. One
    pair-count shuffle + one argmax collect PER MERGE — correct, but at
    real vocab sizes (32k merges) it is 32k Spark jobs of scheduler
    overhead, which is why it is no longer the default path.
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
