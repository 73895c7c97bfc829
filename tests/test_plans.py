"""Physical-plan shape regression tests.

Correctness tests prove the answers right; these prove the *plans* stay
scale-worthy: filters pushed into scans, column-pruned reads, broadcast
joins for bounded dims, map-only stages where no shuffle is needed, and
exactly one shuffle for keyed window aggregation. A regression here means
an operator silently became 100×-at-scale slower without failing any
correctness test.
"""

from __future__ import annotations

from quickstart_streaming_agents_spark.plans import (
    assert_no_exchange,
    assert_no_row_python,
    count_exchanges,
    count_keyed_exchanges,
    count_roundrobin_exchanges,
    physical_plan,
    pushed_filters,
    scan_columns,
)
from quickstart_streaming_agents_spark.queries import QUERIES

from .conftest import SF_DIR


def _q(spark, name: str):
    return QUERIES[name](spark, SF_DIR)


def _synth_pin(spark, name: str, keyed: int, rr: int = 1) -> None:
    """Pin for Python-synthesis queries (r14): the KEYED-exchange budget
    is unchanged from the pre-r14 pin — a hash/range corpus reshuffle
    creeping in still fails — while the guarded ids-only
    ``spread_scan`` round-robin (which parallelizes the single-row-group
    fixture scan and is a no-op at production split counts) gets its own
    small budget instead of being silently uncounted (the old regex
    never matched ``RoundRobinPartitioning``)."""
    df = _q(spark, name)
    assert count_keyed_exchanges(df) == keyed, name
    assert count_roundrobin_exchanges(df) <= rr, name


def test_filter_pushdown_reaches_scan(spark):
    pushed = " ".join(pushed_filters(_q(spark, "filter_project")))
    # the user predicates (not just IsNotNull) are pushed into the scan
    assert "Not(EqualTo(event_type,error))" in pushed


def test_column_pruning_on_fact_scan(spark):
    cols = scan_columns(_q(spark, "pricing_summary"))[0]
    # only the referenced lineitem columns are read, not all 16
    assert "l_comment" not in cols and "l_shipmode" not in cols
    assert "l_quantity" in cols


def test_three_way_join_broadcasts_small_sides(spark):
    plan = physical_plan(_q(spark, "enriched_orders"))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_interval_join_single_agg_shuffle(spark):
    df = _q(spark, "interval_join")
    # one shuffle for the window agg; the join side is broadcast at this SF
    assert count_exchanges(df) == 1
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    # The equi-key must be (event_type, window-bucket) — not event_type
    # alone. Key cardinality then scales with #windows, so a shuffle join
    # at 100× data still spreads across the cluster instead of pinning
    # each hot event_type to one task.
    join_line = next(l for l in plan.splitlines() if "BroadcastHashJoin" in l)
    assert "cand_ws" in join_line and "window_start" in join_line


def test_text_analysis_is_map_only(spark):
    # pure projection — zero KEYED shuffles at any scale; the guarded
    # ids-spread round-robin fires only on parallelism-starved fixture scans
    _synth_pin(spark, "text_analysis", keyed=0)
    assert_no_row_python(_q(spark, "text_analysis"))


def test_tumble_agg_single_shuffle_with_partial_agg(spark):
    df = _q(spark, "tumble_5m_agg")
    assert count_exchanges(df) == 1
    # map-side partial aggregation before the shuffle
    assert physical_plan(df).count("HashAggregate") >= 2


def test_no_cartesian_products_anywhere(spark):
    for name in QUERIES:
        if name == "counts_dashboard":
            continue  # four 1-row aggs crossed deliberately
        assert "CartesianProduct" not in physical_plan(_q(spark, name)), name


def test_no_row_at_a_time_python_anywhere(spark):
    # Python is allowed only as Arrow-batched pandas UDF / mapInPandas /
    # UDTF nodes — BatchEvalPython (pickled row-at-a-time) is banned.
    for name in QUERIES:
        assert_no_row_python(_q(spark, name), name)


def test_curation_pipeline_single_shuffle(spark):
    # scoring + gates are map-only; the only exchange is the dedup window
    df = _q(spark, "curation_pipeline")
    assert count_exchanges(df) == 1
    assert_no_row_python(df)


def test_events_rollup_single_shuffle(spark):
    # grouping sets expand map-side (Expand node); one hash-agg exchange
    df = _q(spark, "events_rollup")
    assert count_exchanges(df) == 1
    assert "Expand" in physical_plan(df)


def test_asof_attribution_single_shuffle_with_pushdown(spark):
    # union + window-fill: both event_type filters reach the scan; the
    # only exchange is the key partitioning for the fill window
    df = _q(spark, "asof_attribution")
    assert count_exchanges(df) == 1
    flat = " ".join(pushed_filters(df))
    assert "purchase" in flat and "view" in flat
    # props (the widest column) must not be read
    assert all("props" not in cols for cols in scan_columns(df))


def test_sampling_queries_are_map_only(spark):
    # accept/reject is a scan-fused filter; domain_mix's rate lookup is a
    # driver-side literal CASE, not a join
    assert_no_exchange(_q(spark, "stratified_sample"))
    assert_no_exchange(_q(spark, "domain_mix"))


def test_doc_chunks_map_only(spark):
    # posexplode multiplies rows inside the task — no exchange
    df = _q(spark, "doc_chunks")
    assert_no_exchange(df)
    assert_no_row_python(df)


def test_repetition_filter_partial_aggregation(spark):
    # two keyed aggs + join, all on doc_id-shaped keys; every agg must
    # have its map-side partial phase
    df = _q(spark, "repetition_filter")
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 4  # partial+final for both aggs
    assert_no_row_python(df)


def test_pii_redaction_map_only(spark):
    _synth_pin(spark, "pii_redaction", keyed=0)
    assert_no_row_python(_q(spark, "pii_redaction"))


def test_sequence_packing_single_shuffle(spark):
    # map-side bucket+count projection; the per-bucket cumsum window is
    # the only exchange; the span explode is in-task (Generate node)
    df = _q(spark, "sequence_packing")
    assert count_exchanges(df) == 1
    assert_no_row_python(df)


def test_snapshot_diff_fingerprints_before_join(spark):
    # only (id, 8-byte-ish fingerprint) pairs cross the full-outer join —
    # no text column survives into either exchange
    df = _q(spark, "snapshot_diff")
    plan = physical_plan(df)
    for frag in plan.split("Exchange")[1:]:
        head = frag.splitlines()[0]
        assert "text" not in head, head
    assert_no_row_python(df)


def test_substring_ops_stay_jvm(spark):
    # window explode + hash agg + interval merge: bounded exchanges, all
    # whole-stage codegen, zero Python of any kind
    for name in ("duplicate_spans", "substring_dedup_clean"):
        df = _q(spark, name)
        assert count_exchanges(df) <= 5, name
        plan = physical_plan(df)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name


def test_capstone_exchange_counts_pinned(spark):
    # The two most expensive registered queries must keep the PLANS.md
    # KEYED exchange budgets (4 and 5): curate/score is map-only, each
    # dedup/decontaminate/cluster/split stage adds exactly one shuffle,
    # and packing adds only the per-bucket cumsum. A regression here is
    # the difference between "fast at 100 TB" and "reshuffles the
    # corpus". r15: the docs input is additionally spread (round-robin,
    # guarded no-op at production split counts) so the regex-heavy
    # scoring projection parallelizes on single-split fixture scans —
    # budgeted explicitly so a creeping keyed corpus reshuffle still
    # fails loudly.
    tdp = _q(spark, "training_data_pipeline")
    pts = _q(spark, "packed_training_shards")
    assert count_keyed_exchanges(tdp) == 4
    assert count_keyed_exchanges(pts) == 5
    # docs feeds two subtrees (scoring + the benchmark branch), so the
    # initial plan prints the one spread exchange twice; AQE stage reuse
    # dedups it at runtime (same canonical subtree)
    assert count_roundrobin_exchanges(tdp) <= 2
    assert count_roundrobin_exchanges(pts) <= 2


def test_dedup_winners_partial_aggregate(spark):
    # Hot-key safety: the first-occurrence/latest-state winner picks must
    # be min/max(struct(...)) aggregates WITH a map-side partial phase —
    # a regression to row_number-over-window re-sorts every hot key's
    # rows on a single reducer.
    for name in ("dedup_exact", "line_dedup_clean", "latest_state_upsert",
                 "substring_dedup_clean"):
        plan = physical_plan(_q(spark, name))
        assert "partial_min(struct" in plan or "partial_max(struct" in plan, name
        assert "RunningWindowFunction" not in plan, name


def test_round7_query_plan_budgets_pinned(spark):
    """Round-7 additions keep their PLANS.md shapes: the map-only
    queries must stay at ZERO exchanges (scan-speed at 100 TB), the
    snowflake analogs at exactly one big shuffle with everything else
    broadcast, and the winnowing pair miner within its 4-exchange
    budget. A regression here is a corpus reshuffle creeping in."""
    assert count_exchanges(_q(spark, "chat_template_render")) == 0
    _synth_pin(spark, "quality_classifier_score", keyed=0)
    for name in ("nation_profit", "nation_market_share",
                 "disjunctive_revenue"):
        assert count_exchanges(_q(spark, name)) == 1, name
    # raw-plan count (pre-AQE exchange reuse; PLANS.md reports 4 after
    # reuse): window sort, distinct, freq agg, fp join, pair agg
    assert count_exchanges(_q(spark, "winnowing_dedup_pairs")) <= 6
    assert count_exchanges(_q(spark, "ann_pq_adc_topk")) <= 1


def test_round8_query_plan_budgets_pinned(spark):
    """Round-8 additions keep their shapes: dHash computation and the
    quality digest are map-only (scan-speed at 100 TB); the PCA moment
    pass collapses to the tiny (1+d+d(d+1)/2)-row combine in ONE
    exchange; the banded phash dedup stays within its 4-exchange
    budget (band window, candidate self-join reuse, dup distinct,
    keeper join)."""
    _synth_pin(spark, "quality_classifier_digest", keyed=0)
    _synth_pin(spark, "image_dhash", keyed=0)
    assert count_exchanges(_q(spark, "pca_moments")) == 1
    # keyed budget unchanged; the synth ids-spread appears once per
    # consumer subtree in the initial plan (runtime exchange reuse
    # collapses the identical copies)
    ipd = _q(spark, "image_phash_dedup")
    assert count_keyed_exchanges(ipd) <= 4
    assert count_roundrobin_exchanges(ipd) <= 5


def test_round8b_query_plan_budgets_pinned(spark):
    """Second-half round-8 additions keep their shapes: the CMS cells
    aggregate + probe stays within 2 exchanges (the sketch itself is
    broadcast); temperature allocation is one corpus agg + the tiny
    strata window; SQ8 is the bounds agg + the salted top-k (encode and
    scoring are map-only); the Bloom tier adds NO exchange over the
    shingle flow (bitset rides as a broadcast literal); entropy is the
    postings agg + doc agg."""
    # raw pre-reuse count: postings agg feeds both the exact top-k and
    # the cells agg through a persist (PLANS.md reports 2 after reuse)
    assert count_exchanges(_q(spark, "cms_heavy_hitters")) <= 4
    assert count_exchanges(_q(spark, "temperature_mix")) <= 2
    assert count_exchanges(_q(spark, "ann_sq8_topk")) <= 2
    # keyed budgets unchanged from the pre-r14 pins; the ids-spread
    # round-robin appears once per consumer subtree in the initial plan
    # (runtime exchange reuse collapses the copies)
    bd = _q(spark, "bloom_decontamination")
    assert count_keyed_exchanges(bd) <= 2
    assert count_roundrobin_exchanges(bd) <= 3
    assert count_exchanges(_q(spark, "token_entropy_score")) <= 2
    edd = _q(spark, "edit_distance_dedup")
    assert count_keyed_exchanges(edd) <= 4
    assert count_roundrobin_exchanges(edd) <= 5
    assert count_exchanges(_q(spark, "bigram_backoff_score")) <= 7


def test_round8c_query_plan_budgets_pinned(spark):
    """Third-wave round-8 additions keep their shapes (VERDICT r8
    "What's wrong" #3 — these families had no pins and were free to
    grow shuffles silently). The text gates and demux/ingest tiers are
    MAP-ONLY (scan-speed at 100 TB); url dedup is map + one keeper
    agg; packing_efficiency is the packing flow + its tiny report
    aggs; pagerank's per-iteration edges⋈ranks join broadcasts the
    bounded rank frontier at this SF (0 exchanges here; the shape
    contract is ≤1 shuffle per iteration at scale); zorder key
    computation is pure JVM bit-interleave (the range repartition is
    the caller's write-path step); cumulate is the one keyed window
    agg."""
    for name in ("span_corruption_pairs",
                 "badwords_filter", "unicode_normalize_clean"):
        assert count_exchanges(_q(spark, name)) == 0, name
    _synth_pin(spark, "gzip_text_ingest", keyed=0)
    ucd = _q(spark, "url_canonical_dedup")
    assert count_keyed_exchanges(ucd) == 1
    assert count_roundrobin_exchanges(ucd) <= 2
    # sequence_packing itself is 1 exchange; the report adds ≤2 tiny aggs
    assert count_exchanges(_q(spark, "packing_efficiency")) <= 3
    assert count_exchanges(_q(spark, "link_pagerank")) <= 5  # ≤1/iter
    assert count_exchanges(_q(spark, "zorder_key")) <= 1
    assert count_exchanges(_q(spark, "cumulate_agg")) == 1


def test_round9_query_plan_budgets_pinned(spark):
    """Round-9 additions keep their shapes: the MP4-PCM fingerprint,
    the WARC record walk and the EXIF parse are map-only Python tiers
    fused into the scan (0 exchanges — scan speed at 100 TB); the HLL
    sketch is two bounded aggregates (register agg collapses map-side
    to ≤2^p keys) + the exact-count bracket (countDistinct expand) and
    its broadcast join."""
    for name in ("mp4_pcm_energy_sig", "warc_record_index",
                 "jpeg_exif_meta"):
        _synth_pin(spark, name, keyed=0)
    assert count_exchanges(_q(spark, "hll_distinct_sketch")) <= 4
    # one corpus pass: shingle left-join (benchmark broadcast) into a
    # single doc-keyed agg; the flags join back is broadcast
    assert count_exchanges(_q(spark, "contamination_fraction")) <= 2
    assert count_exchanges(_q(spark, "script_detect_profile")) == 0
    # IVF-PQ: candidate equi-join on cell + per-subspace broadcast LUT
    # joins + the top-k window — the assignments/codes are map-only
    assert count_exchanges(_q(spark, "ann_ivfpq_topk")) <= 3
    assert count_exchanges(_q(spark, "pii_credit_card_audit")) == 0
    # r9c final-commit query, landed properly in r10 (VERDICT r9 #2):
    # C4 boilerplate strip is a pure-JVM regexp chain fused into the scan
    assert count_exchanges(_q(spark, "html_text_extract")) == 0


def test_round10_query_plan_budgets_pinned(spark):
    """Round-10 additions keep their shapes: the IMA ADPCM fingerprint
    and the TAR walk are map-only Python tiers fused into the scan
    (0 exchanges — scan speed at 100 TB); WebDataset grouping adds one
    small agg over the walk; the k-mins sketch is ONE bounded aggregate
    (≤ k rows/stratum), its estimate one more tiny agg, and the overlap
    join runs on |strata|·k sketch rows only."""
    _synth_pin(spark, "adpcm_energy_sig", keyed=0)
    _synth_pin(spark, "tar_member_index", keyed=0)
    _synth_pin(spark, "webdataset_samples", keyed=1)
    assert count_exchanges(_q(spark, "kmins_token_sketch")) == 1
    assert count_exchanges(_q(spark, "kmins_distinct_estimate")) <= 2
    assert count_exchanges(_q(spark, "corpus_overlap_minhash")) <= 4
    # IBAN mod-97 audit: exact-integer JVM fold, map-only like Luhn
    assert count_exchanges(_q(spark, "pii_iban_audit")) == 0
    # ZIP central-directory walk + ID3 tag parse: map-only header tiers
    _synth_pin(spark, "zip_member_index", keyed=0)
    _synth_pin(spark, "mp3_id3_meta", keyed=0)
    # mojibake repair: pure-JVM encode/validate/decode chain in the scan
    assert count_exchanges(_q(spark, "mojibake_repair")) == 0
    # G.711 decode tier: map-only like the PCM/ADPCM tiers
    _synth_pin(spark, "g711_energy_sig", keyed=0)
    # PAN pseudonymization: pure-JVM rewrite fused into the scan
    _synth_pin(spark, "pii_pseudonymize", keyed=0)
    # WebDataset decode capstone: shard walk + sample grouping + JPEG
    # decode all inside ONE mapInPandas — zero shuffle
    _synth_pin(spark, "webdataset_decode", keyed=0)
    # OOV rate: tiny broadcast vocab; token agg + top-k cut
    assert count_exchanges(_q(spark, "oov_rate")) <= 3
    # phrase search: broadcast slot table; only matching positions
    # shuffle (start agg + per-doc agg)
    assert count_exchanges(_q(spark, "phrase_search")) <= 2
    # leakage-safe split: one fingerprint-keyed window exchange
    assert count_exchanges(_q(spark, "leakage_safe_split")) == 1
    # EXIF display dims: map-only header composition
    _synth_pin(spark, "exif_display_dims", keyed=0)
    # lang audit: the lang_id map + doc join + confusion agg
    assert count_exchanges(_q(spark, "lang_label_audit")) <= 4
    # markdown strip + code routing: pure-JVM regexp chains in the scan
    _synth_pin(spark, "markdown_strip", keyed=0)
    _synth_pin(spark, "code_detect", keyed=0)
    # classifier stage checksums: two tiny single-row aggs
    assert count_exchanges(_q(spark, "quality_classifier_stage_checksums")) <= 4
    # diversity: (source, token) count + per-source fold, both partial
    assert count_exchanges(_q(spark, "token_diversity")) <= 2


def test_round11_query_plan_budgets_pinned(spark):
    """Round-11 additions keep their shapes. Map-only tiers (0
    exchanges — scan speed at 100 TB): the codec sniff (mapInPandas
    fused into the scan), the href scanner (pure-JVM regexp chain), and
    the VARCHAR-only classifier digest. weighted_sample_topk is the
    hash (map-only) + ONE per-stratum top-k shuffle. robots_gate is one
    broadcast host-join + the per-URL argmax window. The AllPairs
    prefix filter is a multi-stage algorithm by construction (df pass,
    rarity rank, prefix self-join, exact verify) — pinned at its
    authored 12; containment shares ngram_jaccard's bones plus the
    wrapper-building joins."""
    _synth_pin(spark, "codec_sniff_ingest", keyed=0)
    assert count_exchanges(_q(spark, "html_link_extract")) == 0
    _synth_pin(spark, "quality_classifier_digest_only", keyed=0)
    assert count_exchanges(_q(spark, "weighted_sample_topk")) == 1
    assert count_exchanges(_q(spark, "robots_gate")) <= 2
    # 17 = the multi-stage AllPairs shape WITHOUT a postings persist:
    # each consumer re-derives the map-only explode+md5 (scan-fused,
    # zero footprint) instead of materializing the |corpus|·L-row
    # frame — the 4M-doc smoke showed the persist variant fills the
    # disk while recomputation is nearly free. +1 over the pre-legs
    # shape: verification now explodes candidate LEGS and groupBy-s
    # (id_a, id_b) — one extra NARROW exchange of candidate-pair rows
    # in exchange for dropping both wide-__terms-array sort-merge
    # join-backs (measured faster; see OPTIMIZATION_r14.md §11)
    assert count_exchanges(_q(spark, "prefix_filter_dedup")) <= 17
    assert count_exchanges(_q(spark, "containment_dedup")) <= 6
    # capstone: map-only extract/canonicalize + broadcast rules join,
    # argmax window, host agg
    assert count_exchanges(_q(spark, "crawl_frontier_pipeline")) <= 3
    # map-only anchor scan + (host,text) agg, host argmax, host agg
    assert count_exchanges(_q(spark, "anchor_text_index")) <= 4
    # cluster machinery + tiny single-row aggregates (broadcast joins)
    assert count_exchanges(_q(spark, "dedup_savings_report")) <= 4


def test_round11b_query_plan_budgets_pinned(spark):
    """Round-11b additions keep their shapes. Map-only tiers (0
    exchanges — scan-fused byte walks at 100 TB): FLAC STREAMINFO,
    Ogg page demux (real CRC), parquet footer thrift walk, and the
    pure-JVM readability counts. order_priority_check is the
    decorrelated-EXISTS semi join (fact joins + 5-row agg);
    top_supplier_revenue is ONE supplier agg + 1-row max broadcast
    back (never a global window). tfidf shares the single postings
    shuffle across tf/df/stats plus the per-doc ranking window; HITS
    is O(iters) edge-join shuffles with 1-row total broadcasts, the
    pagerank_int budget."""
    assert count_exchanges(_q(spark, "readability_scores")) == 0
    for name in ("flac_stream_meta", "ogg_page_index",
                 "parquet_footer_index", "avro_ocf_block_index"):
        _synth_pin(spark, name, keyed=0)
    # schema-on-read JSON parse is expression-level, scan-fused
    assert count_exchanges(_q(spark, "jsonl_ingest")) == 0
    # DPO pairs: ONE packed-key min/max aggregate, no window/self-join
    _synth_pin(spark, "preference_pairs", keyed=1)
    # token bucket: the groupBy().applyInPandas host shuffle is the
    # ONLY exchange — the recurrence itself is per-host sequential
    assert count_exchanges(_q(spark, "crawl_politeness_gate")) == 1
    # bitext: two broadcast top-k passes (arrow) + per-src argmax window
    assert count_exchanges(_q(spark, "bitext_mining_margin")) <= 2
    # cached inference (r13): cache probe + fresh backfill are BROADCAST
    # joins; the only shuffles are the two distinct() aggs (seed build +
    # miss dedup) — the provider UDF must never see a per-row fan-out
    mpc = _q(spark, "ml_predict_cached")
    p = physical_plan(mpc)
    assert count_exchanges(mpc) <= 4
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    # WHATWG charset precedence is expression-level, scan-fused
    _synth_pin(spark, "charset_sniff", keyed=0)
    assert count_exchanges(_q(spark, "order_priority_check")) <= 4
    assert count_exchanges(_q(spark, "top_supplier_revenue")) <= 3
    # 7 plan NODES, 5 executed shuffles: the persisted postings
    # Exchange is printed inside each of its 3 InMemoryRelation
    # consumers but runs once; the rest is dfreq agg, the 2-exchange
    # countDistinct stats, and the per-doc ranking window
    assert count_exchanges(_q(spark, "tfidf_top_terms")) <= 7
    assert count_exchanges(_q(spark, "hits_scores")) <= 12


def test_script_sql_chain_plan_shape(spark):
    """The script-path chain (r12): TUMBLE rewrite aggregates once, the
    lateral ML_PREDICT is the only Python node (Arrow UDTF), and no
    row-at-a-time Python appears anywhere."""
    df = _q(spark, "script_sql_chain")
    assert count_exchanges(df) <= 2
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan  # row-pickled Python banned
    assert plan.count("ArrowEvalPythonUDTF") == 1


def test_lab_chain_plan_shapes(spark):
    """r13 lab walkthrough chains: every Python lateral is an Arrow UDTF
    (embed + vector search agg + LLM + agent; pre-r13 the vector-search
    UDTFs registered outside the script knob and silently fell back to
    row-pickled BatchEvalPythonUDTF — now pinned useArrow=True at every
    registration), and the final SELECT reads ONE lineage (a view-join
    re-ran the whole ride pipeline once per join branch)."""
    for name, max_exch, n_udtf in (("lab3_chain", 4, 4),
                                   ("lab4_chain", 6, 3)):
        df = _q(spark, name)
        assert count_exchanges(df) <= max_exch, name
        plan = physical_plan(df)
        assert "BatchEvalPython" not in plan, name  # row-pickled banned
        assert plan.count("ArrowEvalPythonUDTF") == n_udtf, name
