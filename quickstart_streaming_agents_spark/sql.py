"""SQL surface — engine functions callable from ``spark.sql``.

The reference's users write Flink SQL; its AI surface appears as scalar
calls and correlated table functions::

    SELECT ... FROM t, LATERAL TABLE(ML_PREDICT('model', prompt))
    SELECT ... FROM t, LATERAL TABLE(AI_RUN_AGENT('agent', prompt)) AS r(status, response)
    SELECT ... FROM t, LATERAL TABLE(VECTOR_SEARCH_AGG(tbl, DESCRIPTOR(embedding), q, 3))

(LAB1-Walkthrough.md:206-255, terraform/lab2-vector-search/main.tf:253-331
in /root/reference.) Spark SQL has the same correlated-lateral shape for
Python UDTFs, so the engine registers:

- ``ml_predict(model_name, prompt) -> STRING`` — scalar pandas UDF, batched.
- ``ml_embed(model_name, text) -> ARRAY<FLOAT>`` — scalar pandas UDF.
- ``ml_predict_t(model_name, prompt)`` — UDTF ``(response STRING)`` for
  ``FROM t, LATERAL ml_predict_t(t.prompt) r``.
- ``ai_run_agent(agent_name, prompt)`` — UDTF ``(status, response)``.
- per vector table ``vector_search_<name>(query_embedding, k)`` — UDTF
  ``(match_id BIGINT, score DOUBLE, rank INT)`` over a broadcast corpus.

Registries are snapshotted at registration time (models/agents defined via
``EngineCatalog.create_model`` / ``create_agent``) — re-register after
catalog changes, exactly like re-running DDL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import udtf

from quickstart_streaming_agents_spark.registries import DEFAULT_CATALOG, EngineCatalog


def register_engine_sql(spark: SparkSession,
                        catalog: EngineCatalog | None = None) -> None:
    """Register the AI-function surface for ``spark.sql`` queries."""
    cat = catalog if catalog is not None else DEFAULT_CATALOG
    models = dict(cat.models)
    agents = dict(cat.agents)

    @F.pandas_udf(T.StringType())
    def _ml_predict(names: pd.Series, prompts: pd.Series) -> pd.Series:
        from quickstart_streaming_agents_spark.providers import resolve_provider

        out = pd.Series([""] * len(prompts), index=prompts.index, dtype=object)
        for name in names.dropna().unique():
            model = models[name]
            fn = resolve_provider(model)
            mask = names == name
            out[mask] = fn(prompts[mask].fillna("").tolist(), model)
        return out

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _ml_embed(names: pd.Series, texts: pd.Series) -> pd.Series:
        from quickstart_streaming_agents_spark.providers import resolve_provider

        out = pd.Series([None] * len(texts), index=texts.index, dtype=object)
        for name in names.dropna().unique():
            model = models[name]
            fn = resolve_provider(model)
            mask = names == name
            out[mask] = pd.Series(
                fn(texts[mask].fillna("").tolist(), model), index=texts[mask].index
            )
        return out

    spark.udf.register("ml_predict", _ml_predict)
    spark.udf.register("ml_embed", _ml_embed)

    @udtf(returnType="response: string")
    class MlPredictT:
        def eval(self, model_name: str, prompt: str):
            from quickstart_streaming_agents_spark.providers import resolve_provider

            model = models[model_name]
            fn = resolve_provider(model)
            yield (fn([prompt or ""], model)[0],)

    @udtf(returnType="status: string, response: string")
    class AiRunAgent:
        def eval(self, agent_name: str, prompt: str):
            from quickstart_streaming_agents_spark.functions.agents import (
                run_agent_once,
            )

            yield run_agent_once(agents[agent_name], prompt or "")

    spark.udtf.register("ml_predict_t", MlPredictT)
    spark.udtf.register("ai_run_agent", AiRunAgent)


_MDA_CACHE: dict[tuple[int, int, float], str] = {}


def register_ml_detect_anomalies_sql(
    spark: SparkSession,
    min_training_size: int = 8,
    max_training_size: int = 50,
    confidence_percentage: float = 95.0,
    enable_stl: bool = False,
) -> str:
    """Register the SQL window-function form of ``ML_DETECT_ANOMALIES``
    (LAB3-Walkthrough.md:119-132, LAB4-Walkthrough.md:150-163 in
    /root/reference) and return its function name.

    The registered function is a grouped-agg pandas UDF evaluated over a
    per-row window frame — Spark's ``WindowInPandasExec`` hands each row its
    trailing frame (history + current), and the UDF runs the same
    ``ar_one_step`` fit as the DataFrame operator, so both surfaces produce
    identical bounds for identical history. Spark disallows struct returns
    from grouped-agg UDFs, so the UDF emits ``array<double>``
    ``[forecast, upper, lower, is_anomaly]``; the script rewriter rebuilds
    the reference's ``anomaly_result`` struct JVM-side (script.py).

    Scale note: the frame should be capped at ``maxTrainingSize PRECEDING``
    (the rewriter does this) — AR training never looks further back, so the
    per-row frame transfer is O(maxTrainingSize), not O(partition).
    The one-pass-per-key DataFrame operator (operators/anomaly.py) remains
    the bulk path; this form exists for walkthrough-SQL parity.
    """
    if enable_stl:
        raise NotImplementedError(
            "enableStl=TRUE is not supported on the SQL path (every reference "
            "use sets FALSE — LAB3-Walkthrough.md:126, LAB4-Walkthrough.md:158); "
            "use operators/anomaly.ml_detect_anomalies(enable_stl=True)."
        )
    from pyspark.sql.functions import PandasUDFType

    from quickstart_streaming_agents_spark.operators.anomaly import (
        _z_for_confidence,
        ar_one_step,
    )

    key = (int(min_training_size), int(max_training_size), float(confidence_percentage))
    fn_name = _MDA_CACHE.get(key)
    if fn_name is None:
        fn_name = "ml_da_{}_{}_{}".format(
            key[0], key[1], str(key[2]).replace(".", "_").replace("-", "m")
        )
        _MDA_CACHE[key] = fn_name

    z = _z_for_confidence(confidence_percentage)
    min_n, max_n = key[0], key[1]

    @F.pandas_udf(T.ArrayType(T.DoubleType()), PandasUDFType.GROUPED_AGG)
    def _detect(v):
        vals = v.to_numpy(dtype="float64")
        train = vals[:-1][-max_n:]
        step = ar_one_step(train, min_n, z)
        if step is None:
            return [None, None, None, 0.0]
        fc, up, lo = step
        cur = float(vals[-1])
        return [fc, up, lo, 1.0 if (cur > up or cur < lo) else 0.0]

    spark.udf.register(fn_name, _detect)
    return fn_name


def register_vector_table_sql(
    spark: SparkSession,
    name: str,
    vector_table: DataFrame,
    id_col: str,
    embedding_col: str = "embedding",
) -> str:
    """Register ``vector_search_<name>(query_embedding, k)`` — the SQL form
    of VECTOR_SEARCH_AGG over this corpus. The corpus is normalized once on
    the driver and shipped to workers via a broadcast captured in the UDTF
    closure (same physical plan as functions/vector.vector_search: exact
    top-k, zero shuffle on the query side)."""
    import numpy as np

    pdf = vector_table.select(id_col, embedding_col).toPandas()
    mat = np.stack(pdf[embedding_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ids = pdf[id_col].to_numpy()
    b = spark.sparkContext.broadcast((matn, ids))

    @udtf(returnType="match_id: bigint, score: double, rank: int")
    class VectorSearch:
        def eval(self, query_embedding, k: int):
            import numpy as np

            m, idv = b.value
            q = np.asarray(query_embedding, dtype=np.float64)
            qn = np.linalg.norm(q)
            scores = m @ (q / qn if qn else q)
            kk = min(int(k), len(scores))
            top = np.argpartition(-scores, kk - 1)[:kk]
            top = top[np.argsort(-scores[top], kind="stable")]
            for rank, j in enumerate(top, start=1):
                yield int(idv[j]), float(scores[j]), rank

    fn_name = f"vector_search_{name}"
    spark.udtf.register(fn_name, VectorSearch)
    return fn_name
