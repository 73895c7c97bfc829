"""High-dimensionality ANN-ladder smoke (round 14, VERDICT r13 #6).

The r13 8M-vector smoke ran the ladder's top tiers at d=16; the
reference's embedding space is 1536-dim. This probe runs PQ-ADC and
IVF-PQ at real vector width (default 1M vectors x d=1536) to show the
scale contracts that are WIDTH-dependent still hold:

- the ADC lookup table stays |Q|*m*n_centroids doubles — independent
  of d — so the broadcast cap holds at any width;
- the only shuffle carries ids+codes (m small ints per vector), never
  the d-wide embeddings: corpus vectors are consumed where they are
  scanned (encode / probe-assign passes), width grows the SCANS
  linearly and the shuffles not at all;
- the cardinality contract (exactly k hits per query) survives — cell
  probing and partial-top-k pruning never starve a query.

Corpus vectors are JVM-synthesized (xxhash64 -> transform over a
sequence) per pass, the stand-in for a parquet scan of a real corpus;
synthesis is O(d) JVM math fused into each scan, so pass timings
include it exactly as they would include parquet decode.

    python tools/scale_smoke_highdim.py                    # 1M x 1536
    SMOKE_ROWS=2000000 SMOKE_DIM=512 python tools/scale_smoke_highdim.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def main() -> None:
    rows = int(os.environ.get("SMOKE_ROWS", 1_000_000))
    dim = int(os.environ.get("SMOKE_DIM", 1536))
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.similarity import (
        ann_ivf_pq,
        pq_adc,
    )
    from quickstart_streaming_agents_spark.session import get_spark, ship_package

    spark = get_spark("scale_smoke_highdim")
    ship_package(spark)

    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.xxhash64(F.col("cid"), j) % 1000) / 500.0 - 1.0,
    )
    corpus = (
        spark.range(rows)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("id").alias("cid"), emb.alias("embedding"))
    )

    # PQ-ADC tier: m subspaces of dim/m floats each; LUT is
    # |Q|*m*n_centroids doubles regardless of dim.
    n_q = 1000
    queries_df = corpus.filter(F.col("cid") % (rows // n_q or 1) == 0) \
        .select(F.col("cid").alias("qid"), "embedding")
    n_q_real = queries_df.count()
    t0 = time.perf_counter()
    n_adc = pq_adc(queries_df, corpus, "qid", "cid", k=5, m=8,
                   n_centroids=16).count()
    assert n_adc == n_q_real * 5, (
        f"pq_adc dropped queries: {n_adc} != {n_q_real} * 5"
    )
    print(f"{'pq-adc (m=8, k=5)':28s} {time.perf_counter() - t0:7.2f}s  "
          f"({rows:,} corpus x d={dim}, {n_q_real} queries)", flush=True)

    # IVF-PQ tier: coarse cells prune candidates, PQ codes bound the
    # bytes; the ADC LUT is a broadcast DataFrame, scoring pure JVM.
    n_q2 = 200
    queries2 = corpus.filter(F.col("cid") % (rows // n_q2 or 1) == 0) \
        .select(F.col("cid").alias("qid"), "embedding")
    n_q2_real = queries2.count()
    t0 = time.perf_counter()
    topk = ann_ivf_pq(queries2, corpus, "qid", "cid",
                      n_cells=32, n_probe=4, m=8, n_centroids=16)
    n_topk = topk.count()
    assert n_topk == n_q2_real * 5, (
        f"ann_ivf_pq dropped queries: {n_topk} != {n_q2_real} * 5"
    )
    print(f"{'ivf-pq ann':28s} {time.perf_counter() - t0:7.2f}s  "
          f"({rows:,} corpus x d={dim}, {n_q2_real} queries)", flush=True)


if __name__ == "__main__":
    main()
