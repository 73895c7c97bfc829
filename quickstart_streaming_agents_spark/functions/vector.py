"""``vector_search`` — top-k cosine search as a per-row lateral function.

Reference: ``LATERAL TABLE(VECTOR_SEARCH_AGG(tbl, DESCRIPTOR(embedding),
query_embedding, k))`` → ``search_results ARRAY<ROW(…table cols…, score)>``
(terraform/lab2-vector-search/main.tf:292, LAB3-Walkthrough.md:343-350,
LAB4-Walkthrough.md:301-309; Atlas index = cosine, numCandidates=500,
assets/pre-setup/MongoDB-Setup.md:72-83).

Spark-first design: the vector table (a bounded external corpus — document
chunks, policies) is collected once and **broadcast** to every executor as
a dense normalized float64 matrix; each Arrow batch of query vectors is one
numpy matmul + argpartition. That is the exact-search scale path: corpus
up to O(1-10 GB) broadcasts fine on a 1000-executor cluster, and the fact
side streams through mapInPandas with zero shuffle. Larger corpora switch
to the LSH-bucketed ANN in operators/similarity.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assert_broadcastable_corpus(
    vector_table: DataFrame,
    embedding_col: str = "embedding",
    max_broadcast_bytes: int = 1 << 30,
    max_broadcast_rows: int = 2_000_000,
) -> int:
    """Fail loudly (not with a driver OOM) when a corpus is too big for the
    exact-broadcast tier. Returns the corpus row count.

    The byte bound estimates the normalized float64 matrix (rows × dim ×
    8); the row bound additionally caps the per-row METADATA dicts that
    are collected and broadcast alongside it (a low-dim corpus with fat
    text columns can pass the matrix bound and still OOM the driver).
    Oversized corpora should use the shuffle-shaped ANN operators
    (operators/similarity.ann_lsh / ann_ivf) instead.
    """
    # ONE agg action for both bounds — a separate count() + first() pair
    # costs two full driver jobs per registration, which dominates the
    # script-chain queries that register tiny corpora (guide §5: the
    # driver should do almost no data work, and job count IS driver work)
    row = vector_table.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size(F.col(embedding_col))).alias("dim"),
    ).first()
    n = row["n"]
    if n > max_broadcast_rows:
        raise ValueError(
            f"vector corpus has {n} rows > max_broadcast_rows "
            f"{max_broadcast_rows}; metadata collection would risk a driver "
            "OOM — use the ANN operators or raise the bound explicitly."
        )
    # max(size) over the corpus, not first()'s arbitrary row — an equal or
    # STRICTER byte estimate for ragged-dim corpora
    dim = max(row["dim"] or 0, 0)
    est = n * dim * 8
    if est > max_broadcast_bytes:
        raise ValueError(
            f"vector corpus ≈{est / 1e9:.1f} GB ({n} rows × dim {dim}) exceeds the "
            f"exact-broadcast tier bound ({max_broadcast_bytes / 1e9:.1f} GB). Use "
            "operators/similarity.ann_lsh or ann_ivf (bucketed shuffle, no driver "
            "collect), or raise max_broadcast_bytes explicitly."
        )
    return n


def vector_search(
    df: DataFrame,
    vector_table: DataFrame,
    query_col: str,
    k: int = 3,
    embedding_col: str = "embedding",
    output_col: str = "search_results",
    exclude_self_on: str | None = None,
    exclude_equal_on: tuple[str, str] | None = None,
    max_broadcast_bytes: int = 1 << 30,
) -> DataFrame:
    """Append ``output_col``: top-k cosine matches from ``vector_table``.

    Result element = struct of all vector-table columns except the embedding,
    plus ``score`` (cosine similarity, double). ``exclude_self_on`` names a
    df column matched against the table's first id column to drop self-hits
    (used by self-similarity queries). ``exclude_equal_on`` = (df_col,
    table_col) masks every match whose ``table_col`` equals the row's
    ``df_col`` BEFORE top-k selection — e.g. hard-negative mining, where
    the k nearest vectors with a DIFFERENT label are wanted exactly, not
    "top-k+m then filter and hope".
    """
    import numpy as np

    # NULL embeddings can match nothing and would crash np.stack
    vector_table = vector_table.filter(F.col(embedding_col).isNotNull())
    assert_broadcastable_corpus(vector_table, embedding_col, max_broadcast_bytes)
    meta_fields = [f for f in vector_table.schema.fields if f.name != embedding_col]
    meta_cols = [f.name for f in meta_fields]
    elem_type = T.StructType(
        list(meta_fields) + [T.StructField("score", T.DoubleType())]
    )
    out_schema = T.StructType(df.schema.fields + [T.StructField(output_col, T.ArrayType(elem_type))])
    if exclude_self_on is not None:
        df_dt = df.schema[exclude_self_on].dataType
        id_dt = meta_fields[0].dataType
        if df_dt != id_dt:
            raise TypeError(
                f"exclude_self_on column {exclude_self_on!r} is {df_dt}, the "
                f"corpus id column {meta_fields[0].name!r} is {id_dt} — a "
                "silent type mismatch would never mask any self-hit"
            )
    if exclude_equal_on is not None:
        df_dt = df.schema[exclude_equal_on[0]].dataType
        tbl_dt = vector_table.schema[exclude_equal_on[1]].dataType
        if df_dt != tbl_dt:
            raise TypeError(
                f"exclude_equal_on df column {exclude_equal_on[0]!r} is "
                f"{df_dt}, table column {exclude_equal_on[1]!r} is {tbl_dt} "
                "— a silent type mismatch would mask nothing and quietly "
                "return same-label 'negatives'"
            )

    # Driver-side collect of the bounded corpus; broadcast once per query.
    pdf = vector_table.select(*meta_cols, embedding_col).toPandas()
    if len(pdf):
        mat = np.stack(pdf[embedding_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
    else:  # empty corpus: every query gets an empty result list
        matn = np.zeros((0, 1))
    meta_records = pdf[meta_cols].to_dict("records")
    sc = df.sparkSession.sparkContext
    # tracked so long-lived many-query sessions can free them between
    # queries (runtime.release_tracked_broadcasts — ADVICE r8 leak class)
    from quickstart_streaming_agents_spark.runtime import track_broadcast

    b_mat = track_broadcast(sc.broadcast(matn))
    b_meta = track_broadcast(sc.broadcast(meta_records))
    self_ids = (
        track_broadcast(sc.broadcast(pdf[meta_cols[0]].to_numpy()))
        if exclude_self_on
        else None
    )
    excl_vals = (
        track_broadcast(sc.broadcast(pdf[exclude_equal_on[1]].to_numpy()))
        if exclude_equal_on
        else None
    )
    in_cols = df.columns

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = b_mat.value
        meta = b_meta.value
        ids = self_ids.value if self_ids is not None else None
        evals = excl_vals.value if excl_vals is not None else None
        n_corpus = m.shape[0]
        # One BLAS matmul per row-block instead of one matvec per row; the
        # block height bounds the b×N score matrix at ~64 MB so a huge
        # corpus can't blow executor memory.
        block = max(1, (8 << 20) // max(n_corpus, 1))
        kk = min(k, n_corpus)
        for pdf_in in batches:
            n = len(pdf_in)
            results: list[list[dict]] = [[] for _ in range(n)]
            valid = (
                pdf_in[query_col].notna().to_numpy() if n else np.zeros(0, bool)
            )
            if n and kk > 0 and valid.any():
                vidx = np.flatnonzero(valid)
                q_mat = np.stack(
                    pdf_in[query_col].iloc[vidx].to_numpy()
                ).astype(np.float64)
                qn = np.linalg.norm(q_mat, axis=1)
                qn[qn == 0] = 1.0
                q_mat /= qn[:, None]
                batch_ids = (
                    pdf_in[exclude_self_on].iloc[vidx].to_numpy()
                    if ids is not None else None
                )
                batch_evals = (
                    pdf_in[exclude_equal_on[0]].iloc[vidx].to_numpy()
                    if evals is not None else None
                )
                nv = len(vidx)
                for lo in range(0, nv, block):
                    hi = min(nv, lo + block)
                    scores = q_mat[lo:hi] @ m.T
                    if ids is not None:
                        scores[ids[None, :] == batch_ids[lo:hi, None]] = -np.inf
                    if evals is not None:
                        scores[
                            evals[None, :] == batch_evals[lo:hi, None]
                        ] = -np.inf
                    part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
                    for bi in range(hi - lo):
                        top = part[bi]
                        # (-score, corpus position): ties order by position
                        # instead of argpartition's arbitrary internal order
                        top = top[np.lexsort((top, -scores[bi, top]))]
                        results[vidx[lo + bi]] = [
                            {**meta[j], "score": float(scores[bi, j])}
                            for j in top
                            if np.isfinite(scores[bi, j])
                        ]
            pdf_out = pdf_in[in_cols].copy()
            pdf_out[output_col] = results
            yield pdf_out

    return df.mapInPandas(search, schema=out_schema)


def vector_search_flat(
    df: DataFrame,
    vector_table: DataFrame,
    query_col: str,
    k: int = 3,
    id_col: str = "document_id",
    text_col: str | None = "chunk",
    **kw,
) -> DataFrame:
    """Lab2's flattened ``search_results`` contract: id_1..k, [chunk_1..k],
    score_1..k columns (terraform/lab2-vector-search/main.tf:280-300).
    Array indexing is 1-based in both Flink SQL and ``element_at``."""
    out_col = kw.get("output_col", "search_results")
    out = vector_search(df, vector_table, query_col, k=k, **kw)
    cols = [F.col(c) for c in df.columns if c != query_col]
    for i in range(1, k + 1):
        # try_element_at: fewer than k matches yields NULL columns, not an
        # ANSI INVALID_ARRAY_INDEX error
        elem = F.try_element_at(out_col, F.lit(i))
        cols.append(elem.getField(id_col).alias(f"{id_col}_{i}"))
        if text_col:
            cols.append(elem.getField(text_col).alias(f"{text_col}_{i}"))
        cols.append(elem.getField("score").alias(f"score_{i}"))
    return out.select(*cols)
