"""Results must not depend on the cluster layout.

The repo's scale story leans on determinism claims — "the assignment is
cluster-size independent" (operators/packing.py), canonical-keeper rules
in dedup, hash-based splits/samples. This suite proves them: each query
runs under two deliberately different execution layouts (few vs many
shuffle partitions, default vs tiny scan splits so the parquet scans
produce a different task count) and the collected result must be
identical row-for-row. A query whose answer drifts with parallelism
would give different training data on a 10-node vs 1000-node cluster.
"""

from __future__ import annotations

import datetime

import pytest

from quickstart_streaming_agents_spark.queries import QUERIES
from tests.conftest import SF_DIR

# Deterministic-by-contract queries where a parallelism dependence could
# realistically hide: window/cumsum layout, canonical-keeper picks,
# hash samples and splits, top-k tie-breaks, iterative components.
CASES = [
    "sequence_packing",
    "dedup_exact",
    "topk_per_group",
    "stratified_sample",
    "exact_k_per_stratum",
    "dataset_split",
    "minhash_lsh_dedup",
    "dedup_components",
    "latest_state_upsert",
    "line_dedup_clean",
    "token_budget_mix",
    # r8 integer-exact additions: iterative fixed-point ranks, banded
    # Hamming keepers, Morton keys, partial-top-k ADC ranking
    "link_pagerank",
    "image_phash_dedup",
    "audio_near_dup",
    "zorder_key",
    "ann_pq_adc_topk",
    # r8b: sketch cells (d·w-keyed agg), Bloom prefilter + confirm,
    # sqrt-integer allocation, salted SQ8 top-k, candidate+Levenshtein,
    # lag-window LM scoring
    "cms_heavy_hitters",
    "bloom_decontamination",
    "temperature_mix",
    "ann_sq8_topk",
    "edit_distance_dedup",
    "bigram_backoff_score",
    # r8c: regexp-chain keeper picks, per-row decode metadata, packing
    # fill report (window cumsums must not see partition order)
    "url_canonical_dedup",
    "gzip_text_ingest",
    "packing_efficiency",
    "unicode_normalize_clean",
    "span_corruption_pairs",
    "badwords_filter",
    # r11b: per-host sequential recurrence (state must not see partition
    # or chunk order), packed-key argmax/argmin, L1-normalized integer
    # iterations, rank-order margin folds, rank-ordered tf·idf windows
    "crawl_politeness_gate",
    "preference_pairs",
    "hits_scores",
    "bitext_mining_margin",
    "tfidf_top_terms",
    "weighted_sample_topk",
]

LAYOUTS = [
    {"spark.sql.shuffle.partitions": "3",
     "spark.sql.files.maxPartitionBytes": "32768",
     "spark.sql.files.openCostInBytes": "0"},
    {"spark.sql.shuffle.partitions": "37",
     "spark.sql.files.maxPartitionBytes": "134217728",
     "spark.sql.files.openCostInBytes": "4194304"},
]


def _canon(df):
    cols = sorted(df.columns)
    out = []
    for r in df.collect():
        d = r.asDict()
        vals = []
        for c in cols:
            v = d[c]
            if isinstance(v, float):
                vals.append(f"{v:.9g}")
            elif isinstance(v, datetime.datetime):
                vals.append(v.isoformat())
            else:
                vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", CASES)
def test_layout_invariant(spark, name):
    saved = {k: spark.conf.get(k, None) for k in LAYOUTS[0]}
    results = []
    try:
        for layout in LAYOUTS:
            for k, v in layout.items():
                spark.conf.set(k, v)
            results.append(_canon(QUERIES[name](spark, SF_DIR)))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    a, b = results
    assert a == b, (
        f"{name} drifted with execution layout: {len(a)} vs {len(b)} rows; "
        f"first diff {[x for x in (a[:5], b[:5])]}"
    )
