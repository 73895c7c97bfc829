"""Repeated-substring span detection — window-hash substring dedup.

Beyond-reference surface: document-level dedup (exact/MinHash/SimHash,
operators/dedup.py) misses text duplicated INSIDE otherwise-distinct
documents — boilerplate headers, license blocks, templated paragraphs.
The published fix is suffix-array substring dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", 2021); its
scalable shuffle-friendly approximation, implemented here, slides a
k-token window over every document, finds window hashes occurring more
than once corpus-wide, and merges the hits into maximal per-document
duplicated spans. Every repeated run of ≥ k tokens is covered by some
repeated window, so spans over-approximate the true duplicated regions
with resolution k.

Spark-first plan, three shuffles, all JVM:
1. map-side: tokens → ``posexplode`` of window starts → window hash
   (no shuffle; the explode multiplies rows in-task);
2. hash → corpus frequency (partial-agg combine absorbs in-task
   repeats), keep hashes with df ≥ min_df;
3. positions ⋈ frequent hashes on the hash (equi-join), then one
   per-document window: classic interval-merge via running-max-of-end
   and a group-id cumsum — overlapping or adjacent windows coalesce
   into one span.

At 100 TB the window explode is ~|tokens| rows per doc; the hash
aggregate's partial combine and the 8-byte ``xxhash64`` key keep the
shuffle narrow. Hot boilerplate grams are heavy groups on purpose —
they ARE the signal — and only (hash, count) reaches the reducer in
stage 2. Collision risk at 64 bits only creates a false duplicate span,
never drops one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.text import tokens


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    min_df: int = 2,
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Output: ``id_col``, ``span_start`` / ``span_end`` (token offsets,
    end-exclusive), ``n_windows`` (repeated k-windows merged into the
    span). A window "repeats" when its hash occurs ≥ ``min_df`` times
    corpus-wide — including twice within one document.

    ``gram_hash``: ``"xxhash64"`` (default — 8-byte shuffle key, the
    scale path) or ``"md5"`` (32-char string key, exactly replayable by
    a SQL oracle). Both are deterministic.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if min_df < 2:
        raise ValueError("min_df must be >= 2 (1 would flag every window)")
    if gram_hash not in ("xxhash64", "md5"):
        raise ValueError("gram_hash must be 'xxhash64' or 'md5'")

    wins = _window_hashes(df, id_col, text_col, k, gram_hash)
    frequent = (
        wins.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h")
    )
    pos = wins.join(frequent, "h").select(id_col, "s")
    return _merge_windows(pos, id_col, k)


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    gram_hash: str = "xxhash64",
) -> DataFrame:
    """Substring dedup's apply step (Lee et al. 2021 semantics): for each
    repeated k-token window, the globally-FIRST occurrence — smallest
    (id, offset) — is canonical and stays; every other occurrence is
    stripped. Non-canonical windows merge into maximal spans per document
    and the cleaned text is rebuilt from the surviving tokens.

    Output: ``id_col``, ``clean_text`` (whitespace-normalized),
    ``n_tokens_removed``. Every input document appears exactly once;
    documents without repeated text pass through with 0 removed.

    Plan on top of ``duplicate_spans``'s stages: the canonical occurrence
    per window hash is ``min(struct(id, s))`` — a PARTIAL aggregate, so a
    boilerplate window repeated billions of times collapses map-side —
    and non-canonical occurrences come from an equi-join back on the hash
    (1 winner row per hash on the build side; AQE skew-join can split a
    hot hash's probe partition, which a row_number window never could).
    The interval merge is the same keyed window, and text reconstruction
    is a left join of spans-per-doc (collected to an array — bounded by
    doc length / k) into a JVM higher-order filter over the token array.
    No Python anywhere.

    Deliberate tradeoff: "all but the first occurrence" needs the window
    set twice (pick winners, then filter against them), so this plan
    computes the map-only window-hash pass twice — ~2x the old
    single-pass row_number formulation at toy scale (sf0.1 bench) — in
    exchange for never serializing a hot hash onto one reducer.
    Materializing the pass instead (persist/localCheckpoint) would pin
    tokens x 24 bytes of executor storage — at 100 TB corpus scale that
    is hundreds of TB, strictly worse than recomputing a map-only stage.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if gram_hash not in ("xxhash64", "md5"):
        raise ValueError("gram_hash must be 'xxhash64' or 'md5'")

    wins = _window_hashes(df, id_col, text_col, k, gram_hash)
    # build side: only hashes with >= 2 occurrences can yield a
    # non-canonical row, so unique windows (the vast majority of a real
    # corpus) never enter the join's build side
    winner = (
        wins.groupBy("h")
        .agg(F.min(F.struct(id_col, "s")).alias("__w"),
             F.count("*").alias("__df"))
        .filter(F.col("__df") >= 2)
        .drop("__df")
    )
    noncanon = (
        wins.join(winner, "h")
        .filter(
            ~(
                (F.col(id_col) == F.col(f"__w.{id_col}"))
                & (F.col("s") == F.col("__w.s"))
            )
        )
        .select(id_col, "s")
    )
    spans = _merge_windows(noncanon, id_col, k)
    spans_arr = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("st"), F.col("span_end").alias("en"))
        ).alias("__spans")
    )
    joined = df.select(id_col, text_col).join(spans_arr, id_col, "left")
    kept = F.expr(
        "filter(transform(__toks, (x, i) -> "
        "struct(x AS tok, CAST(i AS BIGINT) AS i)), p -> NOT exists("
        "coalesce(__spans, array()), sp -> p.i >= sp.st AND p.i < sp.en))"
    )
    return (
        joined.withColumn(
            "__toks", tokens(text_col)
        )
        .withColumn("__kept", kept)
        .select(
            id_col,
            F.array_join(F.expr("transform(__kept, p -> p.tok)"), " ").alias(
                "clean_text"
            ),
            (F.size("__toks") - F.size("__kept")).cast("long").alias(
                "n_tokens_removed"
            ),
        )
    )


def _window_hashes(df, id_col, text_col, k, gram_hash):
    """(id, s, h): hash of the k-token window starting at token offset s."""
    toks = tokens(text_col)
    gram = F.array_join(F.slice(F.col("__toks"), F.col("s") + 1, k), " ")
    h = F.xxhash64(gram) if gram_hash == "xxhash64" else F.md5(gram)
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= k)
        .select(
            id_col,
            F.posexplode(
                F.sequence(F.lit(0), F.size("__toks") - k)
            ).alias("__i", "s"),
            "__toks",
        )
        .select(id_col, "s", h.alias("h"))
    )


def _merge_windows(pos: DataFrame, id_col: str, k: int) -> DataFrame:
    """Merge window starts into maximal [span_start, span_end) intervals
    per id: running max of interval ends over preceding rows; a start past
    that max opens a new group (classic interval-merge, one keyed window)."""
    prev = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = pos.withColumn("pmax", F.max(F.col("s") + k).over(prev))
    flagged = marked.withColumn(
        "f",
        F.when(
            F.col("pmax").isNull() | (F.col("s") > F.col("pmax")), 1
        ).otherwise(0),
    )
    grouped = flagged.withColumn("gid", F.sum("f").over(run))
    return (
        grouped.groupBy(id_col, "gid")
        .agg(
            F.min("s").cast("long").alias("span_start"),
            (F.max("s") + k).cast("long").alias("span_end"),
            F.count("*").cast("long").alias("n_windows"),
        )
        .select(id_col, "span_start", "span_end", "n_windows")
    )
