"""Deterministic sampling & domain mixing for training-data pipelines.

Beyond-reference surface: corpus curation needs *reproducible* sampling —
the same document set must be selected on every run, on any cluster, at
any parallelism, or downstream dedup/eval splits silently drift. Spark's
``df.sample`` is seed-dependent on partitioning, so these operators hash
row identity instead:

    u(row) = md5(salt | id)[0:15 hex] as uint60 / 2^60   ∈ [0, 1)
    keep   ⇔  u(row) < fraction

Everything is a pure JVM column expression (map-only, fused into the
scan — zero shuffles, trivially correct at 100 TB), and the md5 → uint60
→ divide-by-2^60 pipeline is exact IEEE-double arithmetic that DuckDB
replays bit-for-bit (``('0x' || substr(md5(k), 1, 15))::UBIGINT /
1152921504606846976.0``), so sampling decisions are oracle-checkable.
15 hex chars = 60 bits keeps the value inside a signed int64 for Spark's
``conv``; division by 2^60 is an exact exponent shift.

``domain_mix`` solves the standard mixture problem: given target weights
w_s over strata, the largest achievable subsample keeps
``n_s = w_s · m`` rows of stratum s where ``m = min_s cnt_s / w_s`` —
downsample-only, no replication. Stratum counts are a tiny aggregate
(collected; |strata| rows) and the per-stratum keep-rates ship to
executors inside the filter expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 2^60 — divisor turning the 60-bit md5 prefix into a unit uniform.
UNIT = float(1 << 60)


def _norm_component(c: Column) -> Column:
    """Collision-safe identity component: NULL gets a distinct sentinel
    (concat_ws would silently SKIP it, colliding (a,NULL) with (NULL,a))
    and literal backslashes/pipes are escaped so the '|' separator cannot
    be forged by data. All no-ops for the typical numeric id columns, so
    existing hashes are unchanged."""
    esc = F.replace(
        F.replace(c.cast("string"), F.lit("\\"), F.lit("\\\\")),
        F.lit("|"),
        F.lit("\\|"),
    )
    return F.coalesce(esc, F.lit("\\N"))


def hash_unit(id_cols: list[str], salt: str = "") -> Column:
    """``[0, 1)`` uniform from row identity — stable across runs/partitions."""
    key = F.concat_ws(
        "|", F.lit(salt), *[_norm_component(F.col(c)) for c in id_cols]
    )
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") / F.lit(UNIT)


def hash_unit_sql(id_exprs: list[str], salt: str = "") -> str:
    """The DuckDB-side replay of :func:`hash_unit` (for oracle SQL)."""
    comps = ", ".join(
        "coalesce(replace(replace(({e})::VARCHAR, '\\', '\\\\'), '|', '\\|'), '\\N')".format(e=e)
        for e in id_exprs
    )
    q_salt = salt.replace("'", "''")
    key = f"concat_ws('|', '{q_salt}', {comps})"
    return f"(('0x' || substr(md5({key}), 1, 15))::UBIGINT / 1152921504606846976.0)"


def hash40_sql(id_exprs: list[str], salt: str = "") -> str:
    """DuckDB replay of :func:`weighted_sample_topk`'s 40-bit row hash
    (10 hex chars of the same md5 key ``hash_unit_sql`` builds) —
    UBIGINT expression; callers CAST the derived column to BIGINT."""
    comps = ", ".join(
        "coalesce(replace(replace(({e})::VARCHAR, '\\', '\\\\'), '|', '\\|'), '\\N')".format(e=e)
        for e in id_exprs
    )
    q_salt = salt.replace("'", "''")
    key = f"concat_ws('|', '{q_salt}', {comps})"
    return f"(('0x' || substr(md5({key}), 1, 10))::UBIGINT)"


def deterministic_sample(
    df: DataFrame, id_cols: list[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by row-identity hash. Changing
    ``salt`` draws an INDEPENDENT sample — two salts' samples overlap, so
    disjoint train/val/test splits need threshold RANGES on one salt
    (as ``queries.dataset_split`` does), never separate salts."""
    return df.filter(hash_unit(id_cols, salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    id_cols: list[str],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep fractions (a deterministic ``sampleBy``)."""
    rate = F.lit(float(default))
    for k, v in sorted(fractions.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(hash_unit(id_cols, salt) < rate)


def mix_rates(counts: dict[str, int], weights: dict[str, float]) -> dict[str, float]:
    """Per-stratum keep-rates realizing ``weights`` as the output mixture.

    ``m = min_s counts[s] / weights[s]`` is the largest total consistent
    with every stratum (downsample-only); stratum s keeps
    ``weights[s] * m / counts[s]``. Strata missing from ``weights`` get 0.
    Pure double arithmetic in a fixed expression shape so the SQL oracle
    computes bit-identical rates.
    """
    eligible = [s for s in weights if counts.get(s) and weights[s] > 0]
    if not eligible:  # empty input: nothing to keep, and no rate to solve
        return {s: 0.0 for s in weights}
    m = min(counts[s] / weights[s] for s in eligible)
    return {
        s: (weights[s] * m / counts[s] if s in eligible else 0.0)
        for s in weights
    }


def domain_mix(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, float],
    id_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Downsample to the target stratum mixture (see :func:`mix_rates`)."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col).agg(F.count("*").alias("n")).collect()
    }
    rates = mix_rates(counts, weights)
    return stratified_sample(df, stratum_col, rates, id_cols, default=0.0, salt=salt)


def token_budget_mix(
    df: DataFrame,
    stratum_col: str,
    tokens_col: str,
    weights: dict[str, float],
    budget: int,
    id_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic downsample realizing ``weights`` as the TOKEN mixture
    within a total token ``budget`` — the data-mix allocator of LLM
    pretraining recipes (domain weights are specified over tokens, not
    documents; cf. the mixture tables of Gao et al. 2020 "The Pile" and
    Touvron et al. 2023).

    Stratum s with token total T_s gets target
    ``t_s = weights[s] / W * budget`` (W = Σ weights) and keep-rate
    ``r_s = min(1, (weights[s] * budget) / (W * T_s))`` — downsample-only:
    a stratum with fewer tokens than its share keeps everything (capped at
    1) and the realized total lands under budget rather than replicating
    rows. Expected kept tokens per stratum ≈ min(t_s, T_s) since the
    row-identity hash is independent of row token counts.

    The rate expression is a FIXED shape — ``(w * budget) / (W * T)``, one
    multiply each side of one divide — so a SQL oracle computing the same
    doubles gets bit-identical rates and the same kept set.

    Scale shape: one partial-agg shuffle of |strata| rows for the token
    totals (collected — strata are domains, low cardinality by
    construction), then a map-only hash filter fused into the scan.
    """
    rates = token_budget_rates(df, stratum_col, tokens_col, weights, budget)
    return stratified_sample(
        df, stratum_col, rates, id_cols, default=0.0, salt=salt
    )


def token_budget_rates(
    df: DataFrame,
    stratum_col: str,
    tokens_col: str,
    weights: dict[str, float],
    budget: int,
) -> dict[str, float]:
    """The profile half of :func:`token_budget_mix`: per-stratum keep
    rates from a (bounded) profile DataFrame. Exposed separately so a
    STREAMING mixer can profile yesterday's corpus batch-side and apply
    the resulting rates as a pure map-only filter on the live stream
    (streaming/pipelines.token_mix_stream_pipeline) — a true global token
    budget over an unbounded stream is undefined, so fixed profiled rates
    realizing the target mixture are the honest contract.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    totals = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col)
        .agg(F.sum(tokens_col).alias("t"))
        .collect()
    }
    w_total = sum(weights.values())
    if w_total <= 0:
        raise ValueError("weights must sum to > 0")
    return {
        s: (
            min(1.0, (weights[s] * float(budget)) / (w_total * float(totals[s])))
            if totals.get(s)
            else 0.0
        )
        for s in weights
    }


def dsir_token_bucket(word_col: Column, n_buckets: int = 1024) -> Column:
    """Stable hashed-feature bucket for a token: md5-prefix mod n_buckets
    — the engine's SQL-replayable hash scheme
    (('0x'||substr(md5(w),1,15))::UBIGINT % n in DuckDB)."""
    return (
        F.conv(F.substring(F.md5(word_col), 1, 15), 16, 10).cast("long")
        % n_buckets
    )


def dsir_bucket_llr(
    docs: DataFrame,
    text_col: str,
    is_target: Column,
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR (Xie et al. 2023) bucket table: Laplace-smoothed (+0.5)
    log-likelihood ratio ln p_target(b) − ln p_background(b) per hashed
    unigram bucket. Returns ≤``n_buckets`` rows
    ``(b, r, tt, st)`` — tt/st are the target/background token totals
    repeated per row so callers can derive the unseen-bucket default
    ratio without a second scan.

    Plan: ONE conditional aggregation over the token stream (n_buckets
    partial-agg rows), totals from a second aggregate over that tiny
    frame; the corpus is scanned once, map-only into the keyed partial
    agg. Shared by the batch dsir_importance_weights query and the
    streaming profile-then-score pipeline — one source of truth for the
    ratio semantics.
    """
    half = n_buckets / 2.0
    tok = docs.select(
        is_target.alias("__t"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).select("__t", dsir_token_bucket(F.col("w"), n_buckets).alias("b"))
    counts = tok.groupBy("b").agg(
        F.count("*").alias("c_src"),
        F.count(F.when(F.col("__t"), 1)).alias("c_tgt"),
    )
    tot = counts.agg(F.sum("c_src").alias("st"), F.sum("c_tgt").alias("tt"))
    return counts.join(F.broadcast(tot)).select(
        "b",
        (F.log((F.col("c_tgt") + 0.5) / (F.col("tt") + half))
         - F.log((F.col("c_src") + 0.5) / (F.col("st") + half))
         ).alias("r"),
        "tt", "st",
    )


def hashed_linear_classifier_score(
    docs: DataFrame,
    text_col: str,
    n_buckets: int = 4096,
    weight_mod: int = 2001,
) -> DataFrame:
    """fastText-style linear text classifier scoring (Joulin et al.
    2016) — the "pretrained quality classifier" stage of LLM data
    curation (GPT-3 §A / LLaMA used exactly this model family to filter
    CommonCrawl against a curated positive class): a document's score is
    the mean weight of its hashed unigram+bigram features through a
    linear model.

    Weights here are the engine's deterministic stand-in for a trained
    model — integer weights in [-(weight_mod-1)/2, +(weight_mod-1)/2]
    derived from the md5 of the bucket id, so the DuckDB oracle can
    replay scoring bit-for-bit (swap in a real weight table by joining
    on ``b`` without changing the plan shape). Bigrams hash into the
    same bucket space as unigrams, as fastText does.

    Per document: ``raw_margin`` = Σ w(b) over all features (exact
    BIGINT — no float accumulation, so no cross-engine sum-order
    drift), ``score`` = raw_margin / (scale · n_features) in a single
    exact division, ``keep`` = raw_margin > 0.

    Plan: map-only — tokenize, build both feature arrays, and fold the
    weight sum entirely inside JVM higher-order array functions; ZERO
    shuffle, zero Python. At 100 TB this runs at scan speed and the
    keep-filter pushes into the next stage.
    """
    clash = {"__ts", "n_features", "raw_margin", "score", "keep"} & set(
        docs.columns
    )
    if clash:
        raise ValueError(
            f"hashed_linear_classifier_score would overwrite input "
            f"columns {sorted(clash)}; rename them first"
        )
    half = (weight_mod - 1) // 2

    def bucket(col: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
            % n_buckets
        )

    def weight(b: Column) -> Column:
        return (
            F.conv(
                F.substring(F.md5(b.cast("string")), 1, 15), 16, 10
            ).cast("long")
            % weight_mod
        ) - half

    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    d = docs.withColumn("__ts", toks)
    uni = F.transform(F.col("__ts"), bucket)
    # bigrams via shifted-slice zip_with, NOT element_at inside a
    # transform lambda: CollapseProject substitutes __ts back to the
    # split expression at every use, and element_at per index would
    # re-run the split O(n) times per doc (no cross-lambda CSE)
    n = F.size("__ts")
    bi = F.when(
        n >= 2,
        F.transform(
            F.zip_with(
                F.slice("__ts", 1, n - 1), F.slice("__ts", 2, n - 1),
                lambda x, y: F.concat(x, F.lit(" "), y),
            ),
            bucket,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    feats = F.concat(uni, bi)
    margin = F.aggregate(
        feats, F.lit(0).cast("long"), lambda acc, b: acc + weight(b)
    )
    return d.select(
        *[c for c in docs.columns],
        F.size(feats).cast("bigint").alias("n_features"),
        margin.alias("raw_margin"),
        (margin / (float(half) * F.size(feats))).alias("score"),
        (margin > 0).alias("keep"),
    ).drop("__ts")


def temperature_allocation(
    df: DataFrame,
    stratum_col: str,
    token_count_col: Column | str,
    *,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled multilingual/domain sampling allocation — the
    mT5/XLM-R recipe: stratum s gets sampling weight T_s^alpha / sum(T^alpha),
    flattening the head so low-resource strata aren't drowned (alpha=1 is
    proportional, alpha->0 is uniform).

    Returns one row per stratum: ``(stratum, n_tokens, w_int, weight,
    target_tokens, epochs)``. ``target_tokens`` allocates ``budget`` by
    the weights; ``epochs = target/n_tokens`` > 1 flags strata that will
    be over-sampled (repeat epochs) at the requested temperature.

    Exactness contract: at the default alpha=0.5 the scaled weight is
    ``floor(sqrt(T_s))`` — IEEE sqrt is correctly rounded in every
    engine, so ``w_int`` is an exact BIGINT and the allocation
    ``budget*w/S`` is pure integer arithmetic a SQL oracle replays
    bit-for-bit (floor(sqrt) == isqrt for token counts up to ~2^40,
    far past any real per-stratum total). Other alphas go through
    ``pow`` — documented cross-engine 1-ULP risk, fine for in-engine
    use, not for hash-checked oracles.

    Scale shape: ONE partial aggregate over the corpus (map-side sums
    per stratum), then |strata|-row window arithmetic — nothing else
    moves. At 100 TB this is the same single-exchange profile as
    `mix_rates`/`token_budget_rates`.
    """
    tok = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    )
    per = df.groupBy(stratum_col).agg(
        F.sum(tok).cast("long").alias("n_tokens")
    )
    if alpha == 0.5:
        w = F.floor(F.sqrt(F.col("n_tokens"))).cast("long")
    else:
        w = F.floor(F.pow(F.col("n_tokens"), F.lit(alpha))).cast("long")
    per = per.withColumn("w_int", w)
    # the global window runs over the |strata|-row aggregate, not the
    # corpus — a deliberate single-partition pass on a tiny frame
    s = F.sum("w_int").over(Window.partitionBy())
    scaled = per.select(
        stratum_col,
        "n_tokens",
        "w_int",
        s.alias("__s"),
        (F.lit(int(budget)) * F.col("w_int")).alias("__num"),
    )
    return scaled.select(
        stratum_col,
        "n_tokens",
        "w_int",
        # single IEEE division + round — bit-identical across engines
        F.round(F.col("w_int") / F.col("__s"), 9).alias("weight"),
        # integer division (Spark `div` == DuckDB `//` on non-negatives)
        F.expr("__num div __s").cast("long").alias("target_tokens"),
        F.round(
            F.expr("__num div __s").cast("long") / F.col("n_tokens"), 6
        ).alias("epochs"),
    )


def weighted_sample_topk(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    k: int,
    id_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic weight-biased top-k selection per stratum: the
    reproducible cousin of weighted reservoir sampling (Efraimidis &
    Spirakis 2006 keys ``u^(1/w)``; we keep the rank ORDER deterministic
    and engine-replayable by using the fixed-point linear key
    ``priority_q20 = h40 << 20 div w`` — h40 the 40-bit md5 row hash —
    so heavier rows draw systematically smaller priorities and the
    chosen set is identical on every run, any cluster, any engine;
    selection bias is weight-proportional in rank, not the exact
    ES-sampling inclusion law, which would need ln()/pow() on doubles
    that no two engines round identically).

    Use case: "keep the k most representative docs per source, biased
    by length/quality weight, reproducibly" — the deterministic-split
    contract (`deterministic_sample`) extended to weighted selection.

    Plan: map-only hash + ONE per-stratum top-k. The window is
    rank-over-partition; at 100 TB the same result ships as a
    groupBy(stratum).agg(min_by-k) two-phase partial agg — the fixture
    window form keeps the oracle a verbatim row_number replay.
    Weights must be >= 1 (integer) — guarded, because ``div 0`` is NULL
    and a zero-weight row must be an explicit upstream filter, not a
    silent NULL-priority winner.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    key = F.concat_ws(
        "|", F.lit(salt), *[_norm_component(F.col(c)) for c in id_cols]
    )
    h40 = F.conv(F.substring(F.md5(key), 1, 10), 16, 10).cast("long")
    w = F.col(weight_col).cast("long")
    pri = df.withColumn("__h40", h40).withColumn(
        "priority_q20",
        F.when(w >= 1, F.expr("__h40 * 1048576 div " + weight_col)
               .cast("long"))
        .otherwise(F.raise_error(F.concat(
            F.lit(f"{weight_col} must be >= 1, got "),
            F.coalesce(w.cast("string"), F.lit("NULL")),
        ))),
    )
    order = [F.col("priority_q20").asc()] + [F.col(c).asc() for c in id_cols]
    rank = F.row_number().over(
        Window.partitionBy(stratum_col).orderBy(*order)
    )
    return (
        pri.withColumn("rank", rank)
        .filter(F.col("rank") <= k)
        .drop("__h40")
    )
