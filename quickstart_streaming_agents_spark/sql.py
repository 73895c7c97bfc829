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
- ``ml_predict_t(model_name, prompt)`` — UDTF ``(response STRING,
  embedding ARRAY<FLOAT>)``; the column matching the model's task is
  filled (Flink types ML_PREDICT from the model's OUTPUT clause) for
  ``FROM t, LATERAL ml_predict_t(t.prompt) r``.
- ``ai_run_agent(agent_name, prompt, *context[, settings MAP])`` — UDTF
  ``(status, response)``.
- per vector table ``vector_search_<name>(query_embedding, k)`` — UDTF
  ``(corpus cols…, score DOUBLE, rank INT)``, one row per match, over a
  broadcast corpus; plus ``vector_search_agg_<name>(query_embedding, k)``
  — ONE row per query with ``search_results ARRAY<ROW(cols…, score)>``,
  the reference contract the walkthrough SQL indexes
  (``vs.search_results[1].chunk``).
- per document corpus ``keyword_search_<name>(query_text, k)`` — lateral
  BM25 top-k over a precomputed broadcast index (the lexical twin).

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
from quickstart_streaming_agents_spark.runtime import (
    track_broadcast as _track_broadcast,
)


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

    @udtf(returnType="response: string, embedding: array<float>", useArrow=True)
    class MlPredictT:
        def eval(self, model_name: str, prompt: str, settings=None):
            # third arg: Flink's optional MAP['debug','true'] settings —
            # accepted for corpus parity, no engine behavior keys yet.
            # Flink types ML_PREDICT's output from the model's OUTPUT
            # clause (terraform/core/main.tf:461,529); a Spark UDTF's
            # schema is fixed at registration, so this one carries BOTH
            # shapes and fills the column matching the model's task —
            # lab SQL references only the column it declared
            # (e.response for textgen, e.embedding for embedding models,
            # LAB3-Walkthrough.md:306, LAB4-Walkthrough.md:256).
            from quickstart_streaming_agents_spark.providers import resolve_provider

            model = models[model_name]
            fn = resolve_provider(model)
            if model.task == "embedding":
                yield (None, fn([prompt or ""], model)[0])
            else:
                yield (fn([prompt or ""], model)[0], None)

    @udtf(returnType="status: string, response: string", useArrow=True)
    class AiRunAgent:
        def eval(self, agent_name: str, prompt: str, *context):
            # extra columns (LAB3 passes the zone key after the reason)
            # join the prompt on newlines, mirroring how the reference
            # feeds multi-column context to the agent; a trailing MAP
            # argument is Flink's optional settings map
            # (LAB4-Walkthrough.md:433 MAP['debug','true']) — accepted,
            # never injected into the prompt
            from quickstart_streaming_agents_spark.functions.agents import (
                run_agent_once,
            )

            full = "\n".join(
                [prompt or ""]
                + [str(c) for c in context
                   if c is not None and not isinstance(c, dict)]
            )
            yield run_agent_once(agents[agent_name], full)

    spark.udtf.register("ml_predict_t", MlPredictT)
    spark.udtf.register("ai_run_agent", AiRunAgent)

    # AI_TOOL_INVOKE(model, prompt, input_args MAP, tools MAP, options MAP)
    # — LAB1-Walkthrough.md:80-92. Flink's MAP[…] literals are rewritten to
    # Spark map(…) by script.rewrite_flink; the tools map's keys are the
    # whitelist and the first tool is invoked single-shot, mirroring the
    # DataFrame form (functions/agents.ai_tool_invoke).
    tool_invoke_type = T.StructType(
        [
            T.StructField("tool_name", T.StringType()),
            T.StructField("result", T.StringType()),
            T.StructField("response", T.StringType()),
        ]
    )

    @F.pandas_udf(tool_invoke_type)
    def _ai_tool_invoke(
        names: pd.Series,
        prompts: pd.Series,
        input_args: pd.Series,
        tools: pd.Series,
        options: pd.Series,
    ) -> pd.DataFrame:
        from quickstart_streaming_agents_spark.functions.agents import (
            invoke_tool_once,
        )

        rows = []
        for name, p, targs, tmap in zip(names, prompts, input_args, tools):
            allowed = list(tmap.keys()) if tmap is not None else []
            tname = allowed[0] if allowed else ""
            if name not in models:
                rows.append(
                    (tname, "", f"tool {tname} failed: 'unknown model {name!r}'")
                )
                continue
            rows.append(invoke_tool_once(tname, p, targs))
        return pd.DataFrame(rows, columns=["tool_name", "result", "response"])

    spark.udf.register("ai_tool_invoke", _ai_tool_invoke)


_MDA_CACHE: dict[tuple[int, int, float, float], str] = {}


def register_ml_detect_anomalies_sql(
    spark: SparkSession,
    min_training_size: int = 8,
    max_training_size: int = 50,
    confidence_percentage: float = 95.0,
    enable_stl: bool = False,
    ridge_lambda: float = 1e-6,
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
    from quickstart_streaming_agents_spark.operators.anomaly import (
        _z_for_confidence,
        ar_one_step,
    )

    key = (int(min_training_size), int(max_training_size),
           float(confidence_percentage), float(ridge_lambda))
    fn_name = _MDA_CACHE.get(key)
    if fn_name is None:
        fn_name = "ml_da_{}_{}_{}_{}".format(
            key[0], key[1],
            str(key[2]).replace(".", "_").replace("-", "m"),
            str(key[3]).replace(".", "_").replace("-", "m"),
        )
        _MDA_CACHE[key] = fn_name

    z = _z_for_confidence(confidence_percentage)
    min_n, max_n = key[0], key[1]

    # Series -> scalar type hints mark this as a grouped-agg pandas UDF
    # (the PandasUDFType enum form warns as deprecated since Spark 3.0)
    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _detect(v: pd.Series) -> list[float]:
        import numpy as np

        vals = v.to_numpy(dtype="float64")
        cur = float(vals[-1]) if len(vals) else float("nan")
        if np.isnan(cur):
            return [None, None, None, 0.0]  # null metric: no verdict
        # NULL metrics must not occupy training slots — one NaN would
        # poison the normal-equation solve (batch-operator contract)
        train = vals[:-1]
        train = train[~np.isnan(train)][-max_n:]
        step = ar_one_step(train, min_n, z, lam=ridge_lambda)
        if step is None:
            return [None, None, None, 0.0]
        fc, up, lo = step
        return [fc, up, lo, 1.0 if (cur > up or cur < lo) else 0.0]

    spark.udf.register(fn_name, _detect)
    return fn_name


def register_vector_table_sql(
    spark: SparkSession,
    name: str,
    vector_table: DataFrame,
    id_col: str,
    embedding_col: str = "embedding",
    max_broadcast_bytes: int = 1 << 30,
) -> str:
    """Register ``vector_search_<name>(query_embedding, k)`` — the SQL form
    of VECTOR_SEARCH_AGG over this corpus.

    The reference contract returns the *full* matched row, not just its id:
    ``search_results[1].chunk/.pages/.section_reference/…``
    (terraform/lab2-vector-search/main.tf:292, terraform/lab4-pubsec-fraud-
    agents/main.tf:164-181, LAB4-Walkthrough.md:280-300). The UDTF therefore
    yields every non-embedding corpus column plus ``score DOUBLE`` and
    ``rank INT``, one row per match — the lateral form of the DataFrame
    surface's array<struct<cols…, score>>.

    The corpus is normalized once on the driver and shipped to workers via
    a broadcast captured in the UDTF closure (same physical plan as
    functions/vector.vector_search: exact top-k, zero shuffle on the query
    side). ``max_broadcast_bytes`` bounds the driver collect — a corpus too
    big for this exact-broadcast tier fails loudly with a pointer at the
    LSH/IVF ANN operators instead of OOMing the driver.
    """
    import numpy as np

    from quickstart_streaming_agents_spark.functions.vector import (
        assert_broadcastable_corpus,
    )

    assert_broadcastable_corpus(vector_table, embedding_col, max_broadcast_bytes)
    meta_fields = [f for f in vector_table.schema.fields if f.name != embedding_col]
    meta_cols = [f.name for f in meta_fields]
    if id_col not in meta_cols:
        raise ValueError(f"id_col {id_col!r} not in vector table columns {meta_cols}")
    # NULL embeddings match nothing and would crash np.stack
    vector_table = vector_table.filter(F.col(embedding_col).isNotNull())
    pdf = vector_table.select(*meta_cols, embedding_col).toPandas()
    mat = np.stack(pdf[embedding_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    meta_rows = [
        tuple(v.item() if hasattr(v, "item") else v for v in row)
        for row in pdf[meta_cols].to_numpy()
    ]
    b = _track_broadcast(spark.sparkContext.broadcast((matn, meta_rows)))

    out_type = T.StructType(
        list(meta_fields)
        + [T.StructField("score", T.DoubleType()), T.StructField("rank", T.IntegerType())]
    )

    class VectorSearch:
        def eval(self, query_embedding, k: int):
            import numpy as np

            m, rows = b.value
            q = np.asarray(query_embedding, dtype=np.float64)
            qn = np.linalg.norm(q)
            scores = m @ (q / qn if qn else q)
            kk = min(int(k), len(scores))
            top = np.argpartition(-scores, kk - 1)[:kk]
            # ties order by corpus position (the DataFrame twin's rule),
            # not argpartition's arbitrary internal order
            top = top[np.lexsort((top, -scores[top]))]
            for rank, j in enumerate(top, start=1):
                yield rows[j] + (float(scores[j]), rank)

    fn_name = f"vector_search_{name}"
    spark.udtf.register(fn_name, udtf(VectorSearch, returnType=out_type, useArrow=True))

    # Reference-faithful aggregate form: ONE row per query holding
    # ``search_results ARRAY<ROW(cols…, score)>`` — the exact shape the
    # walkthrough SQL indexes as ``vs.search_results[1].chunk``
    # (LAB3-Walkthrough.md:242-260, LAB4-Walkthrough.md:280-300,
    # terraform/lab2-vector-search/main.tf:292). rewrite_laterals targets
    # this form; the flat per-match form above stays for rank-style SQL.
    agg_type = T.StructType([
        T.StructField(
            "search_results",
            T.ArrayType(T.StructType(
                list(meta_fields) + [T.StructField("score", T.DoubleType())]
            )),
        )
    ])

    class VectorSearchAgg:
        def eval(self, query_embedding, k: int):
            import numpy as np

            m, rows = b.value
            q = np.asarray(query_embedding, dtype=np.float64)
            qn = np.linalg.norm(q)
            scores = m @ (q / qn if qn else q)
            kk = min(int(k), len(scores))
            if kk <= 0:
                # k=0 (or an empty corpus slice): empty search_results
                # array, matching the flat UDTF's fewer-than-k contract
                # instead of argpartition's kth-out-of-bounds (ADVICE r12).
                yield ([],)
                return
            top = np.argpartition(-scores, kk - 1)[:kk]
            top = top[np.lexsort((top, -scores[top]))]
            yield ([rows[j] + (float(scores[j]),) for j in top],)

    spark.udtf.register(
        f"vector_search_agg_{name}", udtf(VectorSearchAgg, returnType=agg_type, useArrow=True)
    )
    return fn_name


def register_curation_sql(spark: SparkSession) -> None:
    """Training-data curation scalars as **pure SQL UDFs** (Spark 4
    ``CREATE FUNCTION … RETURN expr`` DDL). Unlike Python UDFs these
    inline into the optimized plan — whole-stage codegen, zero Python —
    so the SQL surface pays nothing over the DataFrame surface. Pattern
    constants are imported from ``functions.text`` (single-sourced).
    """
    from quickstart_streaming_agents_spark.functions.text import (
        BPE_PIECE_RE,
        EN_STOPWORDS,
        PII_PATTERNS,
    )

    def q(pat: str) -> str:
        # regex → SQL string literal (Spark SQL processes backslash escapes;
        # embedded single quotes double up)
        return pat.replace("\\", "\\\\").replace("'", "''")

    stop = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    redact_body = "t"
    for _, pat, tag in PII_PATTERNS:
        redact_body = f"regexp_replace({redact_body}, '{q(pat)}', '{tag}')"

    stmts = [
        r"""CREATE OR REPLACE TEMPORARY FUNCTION token_count(t STRING)
            RETURNS INT RETURN size(split(trim(t), '\\s+'))""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION subword_token_count(t STRING)
            RETURNS INT RETURN size(regexp_extract_all(t, '{q(BPE_PIECE_RE)}', 0))""",
        r"""CREATE OR REPLACE TEMPORARY FUNCTION punct_ratio(t STRING)
            RETURNS DOUBLE RETURN
            length(regexp_replace(t, '[a-zA-ZÀ-ÿ0-9 ]', '')) / greatest(length(t), 1)""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION stopword_ratio(t STRING)
            RETURNS DOUBLE RETURN
            size(filter(split(trim(lower(t)), '\\\\s+'), x -> x IN ({stop})))
            / greatest(size(split(trim(t), '\\\\s+')), 1)""",
        r"""CREATE OR REPLACE TEMPORARY FUNCTION doc_fingerprint(t STRING)
            RETURNS STRING RETURN md5(regexp_replace(lower(trim(t)), '\\s+', ' '))""",
        f"""CREATE OR REPLACE TEMPORARY FUNCTION pii_redact(t STRING)
            RETURNS STRING RETURN {redact_body}""",
        r"""CREATE OR REPLACE TEMPORARY FUNCTION sample_hash(k STRING, salt STRING)
            RETURNS DOUBLE RETURN
            conv(substring(md5(concat_ws('|', salt, k)), 1, 15), 16, 10)
            / 1152921504606846976.0""",
    ]
    # url_canonical: the same regexp chain as functions.text.
    # url_canonicalize (single-sourced semantics; the strip chain is
    # inlined twice because a SQL UDF body has no local bindings —
    # constant-count references, not a per-element lambda, so no
    # cross-lambda CSE hazard)
    strip = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "regexp_replace("
        "u, '#.*$', ''), "
        "'&utm_[A-Za-z0-9_]*=[^&#]*', ''), "
        "'[?]utm_[A-Za-z0-9_]*=[^&#]*&', '?'), "
        "'[?]utm_[A-Za-z0-9_]*=[^&#]*$', ''), "
        "'[?&]+$', '')"
    )
    auth = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)"
    auth_nc = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*"
    stmts.append(
        f"""CREATE OR REPLACE TEMPORARY FUNCTION url_canonical(u STRING)
            RETURNS STRING RETURN concat(
              regexp_replace(regexp_replace(regexp_replace(
                lower(regexp_extract({strip}, '{auth}', 1)),
                '://www\\\\.', '://'),
                '^(http://[^:/]*):80$', '$1'),
                '^(https://[^:/]*):443$', '$1'),
              regexp_replace(
                regexp_replace({strip}, '{auth_nc}', ''),
                '^(/.+?)/$', '$1'))""",
    )
    # round 10: the PII-validation and boilerplate-strip tiers as pure
    # SQL UDFs too (same zero-Python property). Bodies mirror the
    # functions.text DataFrame builders; equivalence is pinned row-wise
    # in tests/test_sql_surface.py so the two surfaces cannot drift.
    stmts.append(
        r"""CREATE OR REPLACE TEMPORARY FUNCTION luhn_valid(d STRING)
            RETURNS BOOLEAN RETURN
            aggregate(
              zip_with(
                filter(split(reverse(d), ''), ch -> ch <> ''),
                sequence(1, length(d)),
                (ch, i) -> CASE WHEN i % 2 = 0
                    THEN IF((ascii(ch) - 48) * 2 > 9,
                            (ascii(ch) - 48) * 2 - 9,
                            (ascii(ch) - 48) * 2)
                    ELSE ascii(ch) - 48 END),
              0, (a, x) -> a + x) % 10 = 0"""
    )
    stmts.append(
        r"""CREATE OR REPLACE TEMPORARY FUNCTION iban_valid(s STRING)
            RETURNS BOOLEAN RETURN
            aggregate(
              filter(split(concat(substring(s, 5, 34), substring(s, 1, 4)),
                           ''), ch -> ch <> ''),
              0,
              (a, ch) -> CASE WHEN ascii(ch) BETWEEN 48 AND 57
                  THEN (a * 10 + ascii(ch) - 48) % 97
                  ELSE (a * 100 + ascii(ch) - 55) % 97 END) = 1"""
    )
    html_body = "t"
    for pat, rep in (
        (r"(?is)<script\b[^>]*>.*?</script>", " "),
        (r"(?is)<style\b[^>]*>.*?</style>", " "),
        (r"(?is)<!--.*?-->", " "),
        (r"(?i)</(p|div|br|li|h[1-6]|tr|td)\b[^>]*>", " "),
        (r"<[^>]+>", ""),
    ):
        html_body = f"regexp_replace({html_body}, '{q(pat)}', '{rep}')"
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
                    ("&amp;", "&")):
        html_body = (
            f"replace({html_body}, '{q(ent)}', '{q(ch)}')"
        )
    stmts.append(
        f"""CREATE OR REPLACE TEMPORARY FUNCTION html_strip(t STRING)
            RETURNS STRING RETURN
            trim(regexp_replace({html_body}, '[ \\\\t\\\\n\\\\r\\\\f]+', ' '))"""
    )
    for s in stmts:
        spark.sql(s)


def register_keyword_index_sql(
    spark: SparkSession,
    name: str,
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    max_broadcast_bytes: int = 1 << 30,
) -> str:
    """Register ``keyword_search_<name>(query_text, k)`` — the lexical twin
    of ``vector_search_<name>``: a lateral BM25 top-k over a precomputed
    broadcast index, yielding ``(doc_id BIGINT, score DOUBLE, rank INT)``
    per match.

    Index build is the one distributed postings shuffle
    (operators/retrieval.build_bm25_index); the guarded driver collect and
    per-row scoring mirror ``bm25_search_broadcast`` exactly, so
    ``SELECT … FROM q, LATERAL keyword_search_t(q.text, 5)`` matches the
    DataFrame surface row for row.
    """
    import numpy as np

    from quickstart_streaming_agents_spark.operators.retrieval import (
        build_bm25_index,
    )

    # persist across the guard action and the collect so the expensive
    # index aggregation builds once (same pattern as bm25_search_broadcast)
    index = build_bm25_index(docs, doc_id=doc_id, text=text_col).persist()
    try:
        n_entries = int(
            index.select(F.sum(F.size("postings")).alias("n")).first()["n"] or 0
        )
        if n_entries * 16 > max_broadcast_bytes:
            raise ValueError(
                f"BM25 index ≈{n_entries * 16 / 1e9:.1f} GB exceeds the broadcast "
                f"tier bound ({max_broadcast_bytes / 1e9:.1f} GB); use the "
                "distributed operators/retrieval.bm25_topk instead."
            )
        local = {
            r["term"]: (
                np.array([p["doc_id"] for p in r["postings"]], dtype=np.int64),
                np.array([p["w"] for p in r["postings"]], dtype=np.float64),
            )
            for r in index.collect()
        }
    finally:
        index.unpersist()
    b = _track_broadcast(spark.sparkContext.broadcast(local))

    out_type = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )

    class KeywordSearch:
        def eval(self, query_text, k: int):
            import decimal
            import re as _re

            import numpy as np

            idx = b.value
            if query_text is None:
                return  # null query matches nothing (bm25_topk semantics)
            # ASCII \s split matches the JVM tokenizer that built the
            # index; bare str.split would split Unicode whitespace too
            terms = {
                t
                for t in _re.split(r"\s+", str(query_text).lower().strip(),
                                   flags=_re.ASCII)
                if t
            }
            hits = [idx[t] for t in terms if t in idx]
            if not hits:
                return
            ids = np.concatenate([h[0] for h in hits])
            ws = np.concatenate([h[1] for h in hits])
            uniq, inv = np.unique(ids, return_inverse=True)
            raw = np.bincount(inv, weights=ws)
            # HALF_UP like F.round — np.round's half-even can flip a rank
            scores = np.array([
                float(
                    decimal.Decimal(repr(float(x))).quantize(
                        decimal.Decimal("0.000001"),
                        rounding=decimal.ROUND_HALF_UP,
                    )
                )
                for x in raw
            ])
            order = np.lexsort((uniq, -scores))[: int(k)]
            for rank, j in enumerate(order, start=1):
                yield int(uniq[j]), float(scores[j]), rank

    fn_name = f"keyword_search_{name}"
    spark.udtf.register(fn_name, udtf(KeywordSearch, returnType=out_type, useArrow=True))
    return fn_name
