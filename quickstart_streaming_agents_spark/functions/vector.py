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


def vector_search(
    df: DataFrame,
    vector_table: DataFrame,
    query_col: str,
    k: int = 3,
    embedding_col: str = "embedding",
    output_col: str = "search_results",
    exclude_self_on: str | None = None,
) -> DataFrame:
    """Append ``output_col``: top-k cosine matches from ``vector_table``.

    Result element = struct of all vector-table columns except the embedding,
    plus ``score`` (cosine similarity, double). ``exclude_self_on`` names a
    df column matched against the table's first id column to drop self-hits
    (used by self-similarity queries).
    """
    import numpy as np

    meta_fields = [f for f in vector_table.schema.fields if f.name != embedding_col]
    meta_cols = [f.name for f in meta_fields]
    elem_type = T.StructType(
        list(meta_fields) + [T.StructField("score", T.DoubleType())]
    )
    out_schema = T.StructType(df.schema.fields + [T.StructField(output_col, T.ArrayType(elem_type))])

    # Driver-side collect of the bounded corpus; broadcast once per query.
    pdf = vector_table.select(*meta_cols, embedding_col).toPandas()
    mat = np.stack(pdf[embedding_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    meta_records = pdf[meta_cols].to_dict("records")
    sc = df.sparkSession.sparkContext
    b_mat = sc.broadcast(matn)
    b_meta = sc.broadcast(meta_records)
    self_ids = (
        sc.broadcast(pdf[meta_cols[0]].to_numpy()) if exclude_self_on else None
    )
    in_cols = df.columns

    def search(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = b_mat.value
        meta = b_meta.value
        ids = self_ids.value if self_ids is not None else None
        for pdf_in in batches:
            results = []
            for row_i in range(len(pdf_in)):
                q = np.asarray(pdf_in[query_col].iloc[row_i], dtype=np.float64)
                qn = np.linalg.norm(q)
                scores = m @ (q / qn if qn else q)
                mask_self = None
                if ids is not None:
                    mask_self = ids == pdf_in[exclude_self_on].iloc[row_i]
                    scores = np.where(mask_self, -np.inf, scores)
                kk = min(k, len(scores) - (int(mask_self.sum()) if mask_self is not None else 0))
                top = np.argpartition(-scores, kk - 1)[:kk] if kk > 0 else np.array([], dtype=int)
                top = top[np.argsort(-scores[top], kind="stable")]
                results.append(
                    [{**meta[j], "score": float(scores[j])} for j in top]
                )
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
    out = vector_search(df, vector_table, query_col, k=k, **kw)
    cols = [F.col(c) for c in df.columns if c != query_col]
    for i in range(1, k + 1):
        elem = F.element_at("search_results", i)
        cols.append(elem.getField(id_col).alias(f"{id_col}_{i}"))
        if text_col:
            cols.append(elem.getField(text_col).alias(f"{text_col}_{i}"))
        cols.append(elem.getField("score").alias(f"score_{i}"))
    return out.select(*cols)
