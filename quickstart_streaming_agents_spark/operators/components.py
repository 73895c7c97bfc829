"""Distributed connected components — near-dup pairs → dedup clusters.

Beyond-reference surface: every pairwise dedup tier (exact / n-gram
Jaccard / MinHash-LSH / SimHash / embedding-cosine) emits *pairs*; turning
pairs into clusters (so one canonical doc survives per cluster) is a
connected-components problem. At 100 TB the pair graph doesn't fit a
driver, so this is the alternating large-star / small-star contraction of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC'14) —
a public algorithm that converges in O(log n) rounds, each round two
shuffles (a per-node min aggregation + an equi-join), entirely JVM-side.

Semantics: every node ends up labeled with the minimum node id of its
component (components are identified by their min member).

Scale notes:
- Per-round state is just the edge list; no per-node adjacency list is
  ever materialized (no collect_list), so a hub node with 10⁷ neighbors
  costs a wide groupBy key, not an executor-memory blowup.
- ``localCheckpoint`` truncates lineage each round — without it the plan
  doubles per iteration and the driver dies on plan size long before data
  size matters.
- Convergence test is an aggregate (count + order-insensitive edge
  checksum), one cheap action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Γ⁺ round: every neighbor v > u re-attaches to m = min(Γ(u) ∪ {u}).

    No ``distinct`` here: the output can carry duplicate (v, m) edges, but
    the following small-star round is duplicate-insensitive (its min
    aggregate ignores multiplicity and its own ``distinct`` collapses the
    result), and output multiplicity is bounded by the input edge count —
    so skipping the dedup drops one full shuffle per round for free.
    """
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Γ⁻ round: group edges by their larger endpoint a; every smaller
    neighbor (and a itself) attaches to the group min."""
    canon = edges.select(
        F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
    )
    m = canon.groupBy("a").agg(F.min("b").alias("m"))
    re_b = canon.join(m, "a").select(F.col("b").alias("u"), F.col("m").alias("v"))
    re_a = m.select(F.col("a").alias("u"), F.col("m").alias("v"))
    return re_b.union(re_a).filter(F.col("u") != F.col("v")).distinct()


def _edge_signature(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive and overflow-free (ANSI mode rejects a
    # wrapping SUM of 64-bit hashes)
    row = edges.select(
        F.count("*").alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(least(u, v), greatest(u, v)))"), F.lit(0)
        ).alias("chk"),
    ).first()
    return int(row["n"]), int(row["chk"])


def _local_components(edges: DataFrame) -> DataFrame:
    """Single-task union-find finish for a graph that fits one executor.

    ``coalesce(1)`` (narrow — no shuffle) funnels the edge list into one
    Arrow-batched task that runs path-compressed union-find with the
    "root = min id of set" invariant, so labels are identical to the
    distributed contraction's. Called only below an explicit edge-count
    threshold — this is the bounded-small-side pattern (cf. the broadcast
    guard in functions/vector.py), not an unbounded driver collect.
    """
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    node_type = edges.schema["u"].dataType
    out_schema = StructType(
        [StructField("id", node_type), StructField("component", node_type)]
    )

    def finish(batches):
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for u, v in zip(pdf["u"], pdf["v"]):
                ru, rv = find(u), find(v)
                if ru != rv:
                    # smaller root stays root -> final root = component min
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
        ids = list(parent.keys() | {find(x) for x in parent})
        yield pd.DataFrame(
            {"id": ids, "component": [find(x) for x in ids]}
        )

    return edges.coalesce(1).mapInPandas(finish, out_schema)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    local_threshold: int = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """(src, dst) undirected pair list → (id, component) with component =
    min node id of the connected component. Only nodes appearing in pairs
    are returned (dedup semantics: singletons have no pair, need no label).

    ``max_iter`` is a safety bound far above the O(log n) convergence
    proof — 25 rounds covers graphs with 2^25 nodes of pathological shape.

    ``checkpoint_dir=None`` truncates lineage with ``localCheckpoint`` —
    blocks live on executors, so an executor loss mid-job fails the job.
    Pass a durable path (HDFS/object store on a real cluster) to use
    reliable ``checkpoint()`` instead: each round's edge list persists to
    storage and a long CC job survives executor loss — the right trade at
    real scale, where a 20-round job on a 1000-executor cluster will see
    preemptions.

    ``local_threshold``: once the (monotonically contracting) edge list is
    at or below this many edges — known for free from each round's
    signature aggregate — the remaining rounds are replaced by one
    single-task union-find (``_local_components``). At 100 TB the first
    rounds shrink a billions-of-edges graph fast; finishing the tail
    locally cuts the round count from ~log(n) to "first round that fits",
    and at test scale the whole graph takes the fast path immediately.
    Set 0 to force the pure distributed contraction.

    ``stats``: pass a dict to receive ``{"rounds": r}`` — the number of
    star-contraction rounds actually executed (0 when the local fast path
    takes the whole graph). tests/test_dedup.py uses this to pin the
    O(log n) convergence bound on a pathological path graph.
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def ckpt(df: DataFrame) -> DataFrame:
        # eager=False: the signature aggregate that follows materializes
        # the checkpoint AND computes (count, checksum) in the same job —
        # one action per round instead of two.
        if checkpoint_dir is not None:
            return df.checkpoint(eager=False)
        return df.localCheckpoint(eager=False)

    edges = ckpt(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sig = _edge_signature(edges)
    if stats is not None:
        stats["rounds"] = 0
    if local_threshold and sig[0] <= local_threshold:
        return _local_components(edges)
    converged = False
    for i in range(max_iter):
        edges = ckpt(_small_star(_large_star(edges)))
        new_sig = _edge_signature(edges)
        if stats is not None:
            stats["rounds"] = i + 1
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
        if local_threshold and new_sig[0] <= local_threshold:
            return _local_components(edges)
    if not converged:
        # extracting a star forest from a non-converged edge set would
        # silently emit conflicting component labels for some nodes
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; raise max_iter (expected rounds ~ log(diameter))"
        )
    # Converged state is a star forest: every edge is (member, root).
    members = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = edges.select(
        F.col("v").alias("id"), F.col("v").alias("component")
    ).distinct()
    return members.union(roots).distinct()


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    **cc_kwargs,
) -> DataFrame:
    """Pairs → (id, component, cluster_size, is_canonical): the full dedup
    decision table. ``is_canonical`` marks the one row to keep per cluster
    (the min id — deterministic, join-free to apply: anti-join the
    non-canonical ids against the corpus). Extra keyword arguments
    (``checkpoint_dir``, ``max_iter``, ``local_threshold``) forward to
    :func:`connected_components` — the at-scale reliable-checkpoint path
    is reachable without bypassing this entry point."""
    cc = connected_components(pairs, src, dst, **cc_kwargs)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "component").select(
        "id",
        "component",
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_id: str = "node",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """EXACT-integer PageRank power iteration — the link-graph quality
    prior used by published corpus-curation recipes (host/page rank as
    a quality-weighting signal for CommonCrawl-style corpora; the
    algorithm is Page et al. 1999, the fixed-point arithmetic is what
    makes it engine-replayable).

    Ranks live in integer ``scale``-units (default micro-units):
    every node starts at ``scale``; one iteration is

        r'(v) = (100−d)·scale/100 + d · Σ_{u→v} (r(u) // outdeg(u)) // 100

    with ``//`` integer division — BIGINT end to end, so ANY
    partitioning, accumulation order, or engine computes bit-identical
    ranks (no float summation drift, the same exactness discipline as
    the __tenk money pipelines). Multi-edges contribute once per edge;
    dangling nodes contribute nothing (their mass decays — callers
    wanting the redistribute variant add a dangling-sum term, one
    extra agg).

    Plan per iteration: edges ⋈ ranks on src (the one big shuffle),
    map-side integer division by the broadcast-joined out-degree,
    partial-agg SUM by dst, left join back to the node set for the
    teleport floor. O(iters) shuffles — the canonical distributed PR
    shape; lineage is truncated each round like connected_components.
    """
    if not 1 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be in [1, 100], got {damping_pct}")
    deg = edges.groupBy(src).agg(F.count("*").alias("__dg"))
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).join(
        deg.select(F.col(src).alias("__s"), "__dg"), "__s"
    )
    teleport = (100 - damping_pct) * scale // 100
    ranks = nodes.select(F.col(node_id).alias("__n")).withColumn(
        "__r", F.lit(scale).cast("long")
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.__s == ranks.__n)
            .select("__d", F.expr("__r div __dg").alias("__c"))
            .groupBy("__d")
            .agg(F.sum("__c").alias("__sum"))
        )
        ranks = (
            nodes.select(F.col(node_id).alias("__n"))
            .join(contrib, F.col("__n") == F.col("__d"), "left")
            .select(
                "__n",
                (F.lit(teleport)
                 + F.expr(f"({damping_pct} * coalesce(__sum, 0)) div 100")
                 ).cast("long").alias("__r"),
            )
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        F.col("__n").alias(node_id), F.col("__r").alias("rank_scaled")
    )


def hits_int(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_id: str = "node",
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """EXACT-integer HITS (Kleinberg 1999) — hub/authority scores over
    a link graph, the complementary signal to PageRank: authorities are
    pages good hubs point AT, hubs are pages that point at good
    authorities (anchor-quality weighting for crawl corpora).

    Fixed-point discipline (the pagerank_int convention): scores live
    in integer ``scale``-units, every node starts at ``scale``, and one
    iteration is the mutual update with SUM-normalization::

        a_raw(v) = Σ_{u→v} h(u);   a(v) = a_raw(v)·scale div Σ a_raw
        h_raw(u) = Σ_{u→v} a(v);   h(u) = h_raw(u)·scale div Σ h_raw

    (classic HITS normalizes by L2 — a sqrt no integer plan can
    replay; the L1 form is rank-equivalent and BIGINT end to end, so
    any partitioning or engine computes bit-identical scores.)
    Zero-degree nodes hold score 0 after the first iteration.

    Overflow budget: ``a_raw·scale ≤ Σa_raw·scale`` must fit a long —
    asserted per iteration via the 1-row total (raises before any
    silent wrap; with scale=1e6 the graph can carry ~9.2e12 total raw
    mass, i.e. ~10⁶ nodes × 10⁶ average score — re-scale down for
    bigger graphs).

    Plan per iteration: two (edge ⋈ score) shuffles + two 1-row total
    aggregates broadcast back — O(iters) shuffles total, the same
    shape as pagerank_int; lineage truncated per round.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    n = nodes.select(F.col(node_id).alias("__n"))
    hubs = n.withColumn("__h", F.lit(scale).cast("long"))

    def _norm(raw: DataFrame, col: str) -> DataFrame:
        tot = raw.agg(F.sum(col).alias("__tot"))
        guarded = tot.select(
            F.when(
                F.col("__tot") > (1 << 62) // scale,
                F.expr("raise_error('hits_int: scale overflow — lower scale')"),
            ).otherwise(
                # edgeless graph: total 0 would div-by-zero (null in
                # Spark, an ERROR in replay SQL) — floor at 1, every
                # score is already 0
                F.greatest(F.col("__tot"), F.lit(1))
            ).alias("__tot")
        )
        return raw.join(F.broadcast(guarded)).select(
            raw["*"],
            F.expr(f"({col} * {scale}) div __tot").alias("__norm"),
        ).drop(col).withColumnRenamed("__norm", col)

    auths = None
    for _ in range(iters):
        a_raw = (
            e.join(hubs, e.__s == hubs.__n)
            .groupBy(F.col("__d").alias("__n"))
            .agg(F.sum("__h").alias("__a"))
        )
        auths = _norm(
            n.join(a_raw, "__n", "left").select(
                "__n", F.coalesce("__a", F.lit(0)).cast("long").alias("__a")
            ),
            "__a",
        ).localCheckpoint(eager=False)
        h_raw = (
            e.join(auths, e.__d == auths.__n)
            .groupBy(F.col("__s").alias("__n"))
            .agg(F.sum("__a").alias("__h"))
        )
        hubs = _norm(
            n.join(h_raw, "__n", "left").select(
                "__n", F.coalesce("__h", F.lit(0)).cast("long").alias("__h")
            ),
            "__h",
        ).localCheckpoint(eager=False)
    return (
        auths.join(hubs, "__n")
        .select(
            F.col("__n").alias(node_id),
            F.col("__a").alias("authority_scaled"),
            F.col("__h").alias("hub_scaled"),
        )
    )
