"""Keyword retrieval: inverted-index term statistics and BM25 top-k.

The lexical counterpart of the vector tier (`functions/vector.py` /
`operators/similarity.py`): where the reference searches by embedding
cosine (VECTOR_SEARCH_AGG, terraform/lab2-vector-search/main.tf:292), a
training-data pipeline also needs term-based retrieval — quality
retrieval probes, decontamination lookups, corpus exploration. BM25
(Robertson & Zaragoza 2009) over a whitespace tokenizer, entirely in
JVM built-ins.

Scale shape (100 TB corpus, q queries):
- postings = explode(tokens) → groupBy(doc, term): ONE wide shuffle on
  (doc_id, term) with map-side partial aggregation; this is the
  inverted-index build and dominates cost. Everything downstream
  touches only postings rows whose term appears in a query — the
  query-term set is broadcast, so candidate selection is a map-side
  semi join, never a second full-corpus shuffle.
- corpus stats (N, avgdl) are a 1-row aggregate, broadcast back.
- per-(query, doc) score sum and the top-k window shuffle only the
  candidate set (bounded by postings of query terms), not the corpus.
- For standing workloads, persist `term_stats`/postings once (bucketed
  by term) and amortize the index build across query batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.text import tokens


def _idf_expr():
    """Lucene-form idf — the ONE definition every tier scores with."""
    return F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )


def _bm25_weight_expr(k1: float, b: float):
    return _idf_expr() * (
        F.col("tf")
        * (F.lit(k1) + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )


def postings(
    docs: DataFrame, *, doc_id: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Term-frequency postings: one row per (doc, term) with `tf`.

    Lowercased whitespace tokens — identical to the tokenizer used by
    `repetition_stats` so oracle SQL can replay it verbatim.
    """
    return (
        docs.select(doc_id, F.explode(tokens(F.lower(F.col(text)))).alias("term"))
        .filter(F.col("term") != "")  # split('') yields [''] for blank text
        .groupBy(doc_id, "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(post: DataFrame, *, doc_id: str = "doc_id") -> DataFrame:
    """Per-doc token count derived from postings (no second text pass)."""
    return post.groupBy(doc_id).agg(F.sum("tf").alias("dl"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per query by Okapi BM25.

    Returns (query_id, doc_id, rank, score) with score rounded to 6
    decimals; rank is dense over (rounded score DESC, doc_id ASC) so the
    result is deterministic across engines and summation orders.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))          [Lucene form]
    w(t,d) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    """
    # The postings ARE the inverted index: build (one shuffle) and persist
    # once — every downstream branch (tf candidates, df, dl, corpus stats)
    # reads the cached index instead of re-scanning and re-shuffling the
    # corpus. MEMORY_AND_DISK: spills rather than OOMs at big SF; for
    # standing workloads write it out bucketed by term instead.
    post = postings(docs, doc_id=doc_id, text=text).persist()
    dl = doc_lengths(post, doc_id=doc_id).persist()

    # 1-row corpus stats, broadcast to every candidate row.
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # Tiny query-term set: broadcast; duplicate terms in one query are
    # collapsed (standard bag-of-words-with-binary-query behavior).
    qterms = queries.select(
        query_id, F.explode(tokens(F.lower(F.col(query_text)))).alias("term")
    ).distinct()

    # df(t) only for terms that can score: map-side broadcast semi join
    # on the postings, then a tiny per-term count.
    matched = post.join(F.broadcast(qterms.select("term").distinct()), "term")
    # postings are distinct per (doc, term) already — a plain count equals
    # countDistinct without the extra distinct-aggregate pass
    dfreq = matched.groupBy("term").agg(F.count("*").alias("df"))

    cand = (
        matched.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, doc_id)
        .crossJoin(F.broadcast(stats))
    )
    scored = cand.withColumn("w", _bm25_weight_expr(k1, b)).groupBy(query_id, doc_id).agg(
        F.round(F.sum("w"), 6).alias("score")
    )
    rank_w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(doc_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(query_id, doc_id, "rank", "score")
    )


def phrase_search(
    docs: DataFrame,
    phrases: list[str],
    *,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Exact phrase matching over positional postings — the IR operator
    BM25's bag-of-words scoring cannot express: per (phrase, doc),
    ``n_occurrences`` and ``first_pos`` (1-based token position).

    Algorithm (the classic positional-index intersection): for phrase
    word j at token position i, the candidate phrase START is i − j; a
    real occurrence is a (doc, start) where ALL n word slots are
    present (``count(DISTINCT j) = n`` — repeated words in the phrase
    fill only their own slot).

    100 TB shape: the positions frame filters to phrase terms FIRST
    (a broadcast hash join over a handful of words kills ~everything
    at the scan), so the one (doc, phrase, start) aggregate shuffles
    only matching positions, never the corpus.
    """
    if not phrases or any(not p.strip() for p in phrases):
        raise ValueError("phrases must be non-empty strings")
    # Dedupe (order-preserving): a phrase listed twice would emit its
    # slot rows twice, so every (doc, start) counts 2n slots and the
    # __slots == n_words occurrence test silently never fires
    # (ADVICE r10).
    phrases = list(dict.fromkeys(phrases))
    slots = []  # (phrase, slot index, term, phrase length)
    for p in phrases:
        words = p.strip().lower().split()
        slots.extend((p, j, w, len(words)) for j, w in enumerate(words))
    slot_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            slots, "phrase string, j int, term string, n_words int"
        )
    )
    pos = docs.select(
        doc_id,
        F.posexplode(tokens(F.lower(F.col(text)))).alias("__p0", "term"),
    ).select(doc_id, (F.col("__p0") + 1).alias("i"), "term")
    m = pos.join(slot_df, "term").select(
        doc_id, "phrase", "n_words", "j",
        (F.col("i") - F.col("j")).alias("start"),
    )
    # (doc, phrase, start, j) is UNIQUE in m — i = start + j, so one
    # row per slot — making count(*) ≡ count(DISTINCT j) without the
    # distinct-aggregate's extra exchange
    occ = (
        m.groupBy(doc_id, "phrase", "n_words", "start")
        .agg(F.count("*").alias("__slots"))
        .filter(F.col("__slots") == F.col("n_words"))
    )
    return occ.groupBy(doc_id, "phrase").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.min("start").cast("long").alias("first_pos"),
    )


def vocab_stats(
    docs: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Corpus vocabulary: top-N terms by document frequency.

    Returns (term, df, cf, idf) — document frequency, collection
    frequency, and the BM25 idf — ordered (df DESC, term ASC). The heavy
    step is the same single postings shuffle as `bm25_topk`; the top-N
    is a tiny ordered limit Spark executes as TakeOrderedAndProject
    (per-partition heap + driver merge, no global sort shuffle).
    """
    post = postings(docs, doc_id=doc_id, text=text).persist()
    # N from the postings themselves — a second corpus scan would also
    # count NULL-text docs the postings drop, skewing idf vs bm25_topk
    n_docs = doc_lengths(post, doc_id=doc_id).agg(
        F.count("*").alias("n_docs")
    )
    term_stats = post.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    return (
        term_stats.crossJoin(F.broadcast(n_docs))
        .withColumn("idf", F.round(_idf_expr(), 6))
        .drop("n_docs")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(top_n)
    )


def build_bm25_index(
    docs: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Materialized BM25 index: one row per term with fully precomputed
    per-doc weights — (term, df, postings array<struct<doc_id, w>>).

    Every score component (tf, dl, df, N, avgdl) is known at build time,
    so query-time work is a pure lookup-and-sum. Build cost is the one
    postings shuffle plus a term-keyed aggregation; write the result out
    (bucketed by term) to amortize across query workloads. Hot stopword
    terms produce wide rows — cap them upstream (stopword strip) or rely
    on the broadcast-size guard at load.
    """
    post = postings(docs, doc_id=doc_id, text=text).persist()
    dl = doc_lengths(post, doc_id=doc_id)
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    dfreq = post.groupBy("term").agg(F.count("*").alias("df"))
    weighted = (
        post.join(dl, doc_id)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
    )
    return (
        weighted.withColumn("w", _bm25_weight_expr(k1, b))
        .groupBy("term")
        .agg(
            F.max("df").alias("df"),
            F.collect_list(F.struct(F.col(doc_id).alias("doc_id"), "w")).alias(
                "postings"
            ),
        )
    )


def bm25_search_broadcast(
    queries: DataFrame,
    index: DataFrame,
    *,
    query_id: str = "query_id",
    query_text: str = "query_text",
    k: int = 10,
    max_broadcast_bytes: int = 1 << 30,
) -> DataFrame:
    """Map-only BM25 top-k: the whole precomputed index is broadcast and
    each query row scores locally — the lexical twin of
    ``functions.vector.vector_search``'s exact-broadcast tier.

    Because it is stateless per row, this form runs unchanged on a
    *streaming* queries DataFrame (append mode, no shuffle, no state) —
    the reference's lab-2 "queries topic → search results topic" chain
    (terraform/lab2-vector-search/main.tf:253,292) with keyword search in
    place of vector search. Indexes beyond the broadcast bound belong on
    the distributed ``bm25_topk`` path instead.

    Results are identical to ``bm25_topk`` (same rounding, same
    (score DESC, doc_id ASC) tie-break).
    """
    import decimal

    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    # guard + collect are two actions over the same expensive aggregation
    # — persist across them so the index builds once
    index = index.persist()
    try:
        n_entries = int(
            index.select(F.sum(F.size("postings")).alias("n")).first()["n"] or 0
        )
        est = n_entries * 16  # 8-byte id + 8-byte weight per posting
        if est > max_broadcast_bytes:
            raise ValueError(
                f"BM25 index ≈{est / 1e9:.1f} GB ({n_entries} postings) exceeds the "
                f"broadcast tier bound ({max_broadcast_bytes / 1e9:.1f} GB); use the "
                "distributed bm25_topk instead, or raise max_broadcast_bytes."
            )
        id_dt = index.schema["postings"].dataType.elementType["doc_id"].dataType
        id_np = np.int64 if isinstance(id_dt, (LongType, IntegerType)) else object
        local = {
            r["term"]: (
                np.array([p["doc_id"] for p in r["postings"]], dtype=id_np),
                np.array([p["w"] for p in r["postings"]], dtype=np.float64),
            )
            for r in index.collect()
        }
    finally:
        index.unpersist()
    spark = queries.sparkSession
    from quickstart_streaming_agents_spark.runtime import track_broadcast

    b_index = track_broadcast(spark.sparkContext.broadcast(local))

    id_type = queries.schema[query_id].dataType
    out_schema = StructType(
        [
            StructField(query_id, id_type),
            StructField("doc_id", id_dt),
            StructField("rank", LongType()),
            StructField("score", DoubleType()),
        ]
    )

    def _round6(v: float) -> float:
        # match Spark's F.round: HALF_UP on the shortest decimal repr —
        # np.round is half-to-even on the binary value and can flip the
        # last digit (and a rank boundary) vs the distributed tier
        return float(
            decimal.Decimal(repr(float(v))).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def score(batches):
        idx = b_index.value
        for pdf in batches:
            out_qid, out_doc, out_rank, out_score = [], [], [], []
            for qid, qterms in zip(pdf[query_id], pdf["__qterms"]):
                if qterms is None:
                    continue  # null query text matches nothing, as in bm25_topk
                hits = [idx[t] for t in qterms if t in idx]
                if not hits:
                    continue
                ids = np.concatenate([h[0] for h in hits])
                ws = np.concatenate([h[1] for h in hits])
                uniq, inv = np.unique(ids, return_inverse=True)
                raw = np.bincount(inv, weights=ws)
                scores = np.array([_round6(v) for v in raw])
                order = np.lexsort((uniq, -scores))[:k]
                for rank, j in enumerate(order, start=1):
                    out_qid.append(qid)
                    out_doc.append(uniq[j] if id_np is object else int(uniq[j]))
                    out_rank.append(rank)
                    out_score.append(float(scores[j]))
            yield pd.DataFrame(
                {
                    query_id: pd.Series(out_qid, dtype=object),
                    "doc_id": pd.Series(out_doc, dtype=object),
                    "rank": out_rank,
                    "score": out_score,
                }
            )

    # tokenize JVM-side with the SAME tokenizer as the index build —
    # a second Python tokenization (str.split: Unicode whitespace) would
    # silently diverge from Java's \s+ on exotic whitespace
    tagged = queries.withColumn(
        "__qterms",
        F.array_remove(
            F.array_distinct(tokens(F.lower(F.col(query_text)))), ""
        ),
    )
    return tagged.mapInPandas(score, out_schema)


def unigram_logprob(
    docs: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-doc mean unigram log-probability under the corpus MLE language
    model — the cheap perplexity proxy used for LM-based quality filtering
    (CCNet-style): documents far from the corpus distribution score low.

    Returns (doc_id, n_tokens, avg_logprob, ppl_proxy) with
    avg_logprob = Σ tf·ln(cf/T) / dl over the doc's terms (cf = corpus
    frequency, T = corpus token count) and ppl_proxy = exp(−avg_logprob).

    Plan: the one postings shuffle (persisted), a term-keyed corpus
    frequency aggregate joined back on term, a broadcast 1-row total, and
    a doc-keyed weighted average — no Python anywhere.
    """
    post = postings(docs, doc_id=doc_id, text=text).persist()
    total = post.agg(F.sum("tf").cast("double").alias("t_total"))
    vocab = post.groupBy("term").agg(F.sum("tf").alias("cf"))
    scored = (
        post.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(doc_id)
        .agg(
            F.sum("tf").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.log(F.col("cf") / F.col("t_total")))
                / F.sum("tf")
            ).alias("__avg"),
        )
    )
    return scored.select(
        doc_id,
        "n_tokens",
        F.round("__avg", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("__avg")), 4).alias("ppl_proxy"),
    )


def bigram_backoff_logprob(
    docs: DataFrame,
    profile: DataFrame | None = None,
    *,
    profile_filter: Column | None = None,
    doc_id: str = "doc_id",
    text: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-doc mean bigram log-probability under Stupid Backoff (Brants
    et al. 2007 — the web-scale LM smoothing that needs no discounting
    pass): S(w_i|w_{i-1}) = c(w_{i-1} w_i)/c(w_{i-1}) when the profile
    saw the bigram, else alpha * c(w_i)/N; the first token scores as its
    unigram. A tighter perplexity proxy than `unigram_logprob` for
    quality filtering — word-salad documents with plausible unigrams
    fall off the bigram cliff.

    ``profile`` is the corpus the LM counts come from (the CCNet/DSIR
    recipe: profile on the trusted snapshot, score the incoming corpus);
    default None profiles on ``docs`` itself — note that self-profiling
    can never back off (every scored bigram is in its own count table),
    so pass a real profile when n_backoff should mean anything.
    ``profile_filter`` is the plan-sharing alternative when the profile
    is a WHOLE-DOC row filter of ``docs``: a predicate over ``doc_id``
    ONLY (the positions frame carries no other doc column — a predicate
    on text/metadata belongs in ``profile``; one over w/prev would
    silently break whole-doc semantics), applied to the shared
    tokenize+lag positions so they compute once. Mutually exclusive
    with ``profile``. Words
    unseen in the profile take a 0.5 pseudo-count (seen-word scores are
    untouched — the DSIR smoothing convention).

    Returns ``(doc_id, n_tokens, n_backoff, avg_logprob, ppl_proxy)``
    with ``n_backoff`` = positions that fell back to the unigram path.

    Plan: one doc-keyed window (lag) builds (prev, w) positions — the
    natural per-document partition, no array retention per exploded row;
    unigram and bigram count tables come from two partial-agg shuffles
    keyed by term/pair (map-side collapse on repeated n-grams); counts
    attach by equi-join (broadcast at fixture scale via AQE, shuffle-hash
    at vocab scale); one final doc-keyed average. No Python anywhere.
    """

    def _positions(d: DataFrame) -> DataFrame:
        toks = tokens(F.lower(F.col(text)))
        p = (
            d.select(F.col(doc_id), F.posexplode(toks).alias("i", "w"))
            .filter(F.col("w") != "")
        )
        prevw = F.lag("w").over(Window.partitionBy(doc_id).orderBy("i"))
        return p.select(doc_id, "i", "w", prevw.alias("prev"))

    if profile is not None and profile_filter is not None:
        raise ValueError("pass profile OR profile_filter, not both")
    pos = _positions(docs)
    if profile_filter is not None:
        # the profile is a whole-doc row filter of the scored corpus:
        # reuse the tokenize+lag positions instead of re-deriving them
        # (filtering after the doc-keyed lag is identical — prev never
        # crosses documents)
        ppos = pos.filter(profile_filter)
    elif profile is not None:
        ppos = _positions(profile)
    else:
        ppos = pos

    uni = ppos.groupBy("w").agg(F.count("*").alias("cw"))
    total = uni.agg(F.sum("cw").cast("double").alias("n_total"))
    big = (
        ppos.filter(F.col("prev").isNotNull())
        .groupBy("prev", "w")
        .agg(F.count("*").alias("cpw"))
    )

    uprev = uni.select(
        F.col("w").alias("prev"), F.col("cw").alias("cprev")
    )
    scored = (
        pos.join(uni, "w", "left")
        .join(big, ["prev", "w"], "left")
        .join(uprev, "prev", "left")
        .crossJoin(F.broadcast(total))
    )
    # OOV unigram: 0.5 pseudo-count; seen words keep their exact count
    ucw = F.coalesce(F.col("cw").cast("double"), F.lit(0.5))
    lp = (
        F.when(
            F.col("prev").isNull(),
            F.log(ucw / F.col("n_total")),
        )
        .when(
            F.col("cpw").isNotNull(),
            F.log(F.col("cpw") / F.col("cprev")),
        )
        .otherwise(
            F.log(F.lit(float(alpha))) + F.log(ucw / F.col("n_total"))
        )
    )
    backoff = (
        F.col("prev").isNotNull() & F.col("cpw").isNull()
    ).cast("long")
    agg = scored.groupBy(doc_id).agg(
        F.count("*").alias("n_tokens"),
        F.sum(backoff).alias("n_backoff"),
        (F.sum(lp) / F.count("*")).alias("__avg"),
    )
    return agg.select(
        doc_id,
        "n_tokens",
        "n_backoff",
        F.round("__avg", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("__avg")), 4).alias("ppl_proxy"),
    )


def token_entropy(
    docs: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-doc token-distribution diversity: Shannon entropy of the
    within-doc term distribution plus type-token ratio — the repetition/
    diversity signals quality pipelines gate on (low entropy = chant-like
    repetition; TTR near 1 with high n = unnaturally non-repeating).

    entropy = -Σ (tf/dl)·ln(tf/dl) computed in ONE aggregate pass via
    the identity ln(dl) − Σ tf·ln(tf)/dl (no second join for dl).

    Plan: the postings shuffle, then one doc-keyed partial aggregate.
    """
    post = postings(docs, doc_id=doc_id, text=text)
    agg = post.groupBy(doc_id).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("distinct_tokens"),
        F.sum(F.col("tf") * F.log("tf")).alias("__stlt"),
    )
    ent = F.log(F.col("n_tokens")) - F.col("__stlt") / F.col("n_tokens")
    return agg.select(
        doc_id,
        "n_tokens",
        "distinct_tokens",
        F.round(F.col("distinct_tokens") / F.col("n_tokens"), 9).alias(
            "type_token_ratio"
        ),
        F.round(ent, 6).alias("token_entropy"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
    k: int = 3,
    min_df: int = 1,
    frozen: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Per-document top-k distinctive terms by tf·idf — the keyword-
    extraction primitive (topic tagging, cluster labeling, dedup-
    cluster naming) every corpus-exploration pass runs.

    Returns (doc_id, rank, term, tf, df, score): idf is the Lucene
    form shared with bm25 (``_idf_expr`` — ONE definition for every
    tier), score = tf · idf rounded to 6 decimals BEFORE ranking, and
    rank is row_number over (rounded score DESC, term ASC) so the
    chosen set is deterministic across engines and summation orders
    (the bm25_topk determinism contract).

    Plan: ONE postings shuffle (reused for tf, df, and the 1-row
    n_docs stat), a broadcast of the per-term df (|vocab| rows — at
    open-web vocab sizes swap for a shuffle join by term), and a
    per-doc window. No scan of the corpus happens twice.

    ``frozen=(dfreq, stats)`` scores against a PRE-BUILT vocabulary
    (term→df plus the 1-row n_docs stat) instead of re-deriving it from
    ``docs`` — the profile-then-stream contract
    (streaming/pipelines.tfidf_stream_pipeline): per-doc tf and the
    score arithmetic are unchanged, so a stream scored against the
    frozen corpus vocabulary is bit-exact equal to this batch operator
    run with the same ``frozen``.
    """
    post = postings(docs, doc_id=doc_id, text=text)
    if frozen is not None:
        # frozen vocabulary → postings are consumed exactly once below;
        # persisting here would strand one cached copy per micro-batch in
        # a long-running stream (ADVICE r12), so don't.
        dfreq, stats = frozen
    else:
        post = post.persist()
        dfreq = post.groupBy("term").agg(F.count("*").alias("df")).filter(
            F.col("df") >= min_df
        )
        stats = post.agg(F.countDistinct(doc_id).alias("n_docs"))
    scored = (
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("score", F.round(F.col("tf") * _idf_expr(), 6))
    )
    w = Window.partitionBy(doc_id).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(doc_id, "rank", "term", "tf", "df", "score")
    )
