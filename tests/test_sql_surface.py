"""The engine's spark.sql surface: AI functions as scalar UDFs and
correlated-lateral UDTFs, equivalent to the DataFrame forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.ml import ml_predict
from quickstart_streaming_agents_spark.registries import DEFAULT_CATALOG
from quickstart_streaming_agents_spark.session import ship_package
from quickstart_streaming_agents_spark.sources.parquet import register_views
from quickstart_streaming_agents_spark.sql import (
    register_engine_sql,
    register_vector_table_sql,
)

from .conftest import SF_DIR


def _setup(spark):
    ship_package(spark)
    register_views(spark, SF_DIR)
    register_engine_sql(spark)


def test_sql_ml_predict_matches_dataframe_form(spark):
    _setup(spark)
    got = spark.sql("""
        SELECT doc_id, ml_predict('fake_textgen', 'Summarize: ' || substr(text, 1, 40)) AS response
        FROM documents
    """)
    docs = spark.table("documents")
    model = DEFAULT_CATALOG.models["fake_textgen"]
    want = docs.select(
        "doc_id",
        ml_predict(model, F.concat(F.lit("Summarize: "), F.substring("text", 1, 40))).alias("response"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sql_ml_embed_shape(spark):
    _setup(spark)
    row = spark.sql(
        "SELECT ml_embed('fake_embedding', text) AS e FROM documents LIMIT 1"
    ).collect()[0]
    assert len(row.e) > 0


def test_lateral_ml_predict_t(spark):
    _setup(spark)
    got = spark.sql("""
        SELECT d.doc_id, r.response
        FROM (SELECT doc_id, substr(text, 1, 20) AS p FROM documents LIMIT 5) d,
             LATERAL ml_predict_t('fake_textgen', d.p) r
    """).collect()
    assert len(got) == 5  # 1 row in → 1 row out
    assert all(r.response.startswith("FAKE[fake_textgen]:") for r in got)


def test_lateral_ai_run_agent(spark):
    _setup(spark)
    DEFAULT_CATALOG.create_agent(
        "sql_test_agent", model="fake_textgen",
        prompt="Verdicts must be one of: [OK, FAIL]",
    )
    register_engine_sql(spark)  # re-register to pick up the new agent
    got = spark.sql("""
        SELECT o.o_orderkey, a.status, a.response
        FROM (SELECT o_orderkey, 'order ' || o_orderkey AS p
              FROM orders LIMIT 3) o,
             LATERAL ai_run_agent('sql_test_agent', o.p) a
    """).collect()
    assert len(got) == 3
    assert all(r.status in ("SUCCESS", "FAILED") for r in got)
    assert all(r.response for r in got)


def test_sql_vector_search_matches_dataframe_form(spark):
    _setup(spark)
    emb = spark.table("embeddings")
    register_vector_table_sql(spark, "emb", emb, id_col="vec_id")
    got = spark.sql("""
        SELECT q.vec_id AS query_id, v.vec_id AS match_id,
               ROUND(v.score, 6) AS score, v.rank
        FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q,
             LATERAL vector_search_emb(q.embedding, 4) v
        WHERE v.vec_id <> q.vec_id
    """)
    # DataFrame form: same corpus, k=4 then drop self-hit
    from quickstart_streaming_agents_spark.functions.vector import vector_search

    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    searched = vector_search(queries_df, emb.select("vec_id", "embedding"),
                             "embedding", k=4)
    want = (
        searched.select("query_id", F.posexplode("search_results").alias("pos", "h"))
        .select("query_id", F.col("h.vec_id").alias("match_id"),
                F.round("h.score", 6).alias("score"), (F.col("pos") + 1).alias("rank"))
        .filter(F.col("match_id") != F.col("query_id"))
    )
    g = sorted((r.query_id, r.match_id, r.score) for r in got.collect())
    w = sorted((r.query_id, r.match_id, r.score) for r in want.collect())
    assert g == w


def test_sql_vector_search_returns_full_row_metadata(spark):
    """Lab4 contract: search results carry every corpus column, not just the
    id — search_results[1].chunk/.title/… (terraform/lab4-pubsec-fraud-
    agents/main.tf:164-181). Here `label` is the metadata column."""
    _setup(spark)
    emb = spark.table("embeddings")
    register_vector_table_sql(spark, "embm", emb, id_col="vec_id")
    got = spark.sql("""
        SELECT q.vec_id AS query_id, v.vec_id, v.label, v.score, v.rank
        FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0) q,
             LATERAL vector_search_embm(q.embedding, 3) v
    """).collect()
    assert len(got) == 3
    labels = dict(spark.table("embeddings").select("vec_id", "label").collect())
    for r in got:
        assert r.label == labels[r.vec_id]  # metadata joined through SQL
    assert [r.rank for r in got] == [1, 2, 3]


def test_vector_corpus_broadcast_guard(spark):
    """An over-sized corpus must fail loudly, not OOM the driver."""
    import pytest

    _setup(spark)
    emb = spark.table("embeddings")
    with pytest.raises(ValueError, match="exact-broadcast tier"):
        register_vector_table_sql(spark, "embg", emb, id_col="vec_id",
                                  max_broadcast_bytes=16)


def test_curation_sql_udfs_match_dataframe_surface(spark):
    """The SQL UDF bodies must agree with the Column-expression versions
    and stay fully JVM (SQL UDFs inline — no Python nodes in the plan)."""
    from quickstart_streaming_agents_spark.functions import text as tx
    from quickstart_streaming_agents_spark.operators.sampling import hash_unit
    from quickstart_streaming_agents_spark.sources.parquet import load_table
    from quickstart_streaming_agents_spark.sql import register_curation_sql
    from tests.conftest import SF_DIR

    register_curation_sql(spark)
    docs = load_table(spark, SF_DIR, "documents")
    docs.createOrReplaceTempView("docs_sql")

    got = spark.sql("""
        SELECT doc_id,
               token_count(text) AS n_tok,
               subword_token_count(text) AS n_sub,
               round(punct_ratio(text), 6) AS pr,
               round(stopword_ratio(text), 6) AS sr,
               doc_fingerprint(text) AS fp,
               pii_redact(text) AS red,
               round(sample_hash(cast(doc_id AS STRING), 's'), 9) AS u
        FROM docs_sql
    """)
    assert "BatchEvalPython" not in got._jdf.queryExecution().executedPlan().toString()

    want = docs.select(
        "doc_id",
        tx.token_count("text").alias("n_tok"),
        tx.subword_token_count("text").alias("n_sub"),
        F.round(tx.punct_ratio("text"), 6).alias("pr"),
        F.round(tx.stopword_ratio("text"), 6).alias("sr"),
        tx.doc_fingerprint("text").alias("fp"),
        tx.pii_redact("text").alias("red"),
        F.round(hash_unit(["doc_id"], "s"), 9).alias("u"),
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w and len(g) > 0


def test_keyword_search_udtf_matches_dataframe_surface(spark):
    """LATERAL keyword_search_<t>(text, k) ≡ operators/retrieval.bm25_topk."""
    from quickstart_streaming_agents_spark.operators.retrieval import bm25_topk
    from quickstart_streaming_agents_spark.sources.parquet import load_table
    from quickstart_streaming_agents_spark.sql import register_keyword_index_sql

    docs = load_table(spark, SF_DIR, "documents")
    fn = register_keyword_index_sql(spark, "docs", docs)
    queries = spark.createDataFrame(
        [("qa", "spark hash join"), ("qb", "window agg merge")],
        ["query_id", "query_text"],
    )
    queries.createOrReplaceTempView("kw_queries")
    got = {
        (r.query_id, r.doc_id, r.rank, r.score)
        for r in spark.sql(
            f"SELECT q.query_id, s.doc_id, s.rank, s.score "
            f"FROM kw_queries q, LATERAL {fn}(q.query_text, 5) s"
        ).collect()
    }
    want = {
        (r.query_id, r.doc_id, r.rank, r.score)
        for r in bm25_topk(docs, queries, k=5).collect()
    }
    assert got == want and len(got) == 10


def test_url_canonical_sql_udf_matches_dataframe_surface(spark):
    """url_canonical (SQL UDF) must agree with functions.text.
    url_canonicalize on every rule, fully JVM."""
    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.functions.text import (
        url_canonicalize,
    )
    from quickstart_streaming_agents_spark.sql import register_curation_sql

    register_curation_sql(spark)
    urls = [
        "HTTP://WWW.Ex.COM:80/A/B/",
        "https://ex.com/page?utm_source=x&q=1",
        "https://ex.com/p?utm_a=1&utm_b=2&q=3",
        "https://ex.com/p?autumn_utm_x=1",
        "http://ex.com:443/a",
        "https://ex.com:443/x#y",
        "https://ex.com/#frag",
        "https://ex.com/p?utm_a=1&",
        "https://ex.com/p?a=1&utm_b=2&",
    ]
    df = spark.createDataFrame([Row(u=u) for u in urls])
    df.createOrReplaceTempView("urls_sql")
    got = spark.sql("SELECT u, url_canonical(u) AS c FROM urls_sql")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    want = {r.u: r.c for r in df.select(
        "u", url_canonicalize(F.col("u")).alias("c")).collect()}
    for r in got.collect():
        assert r.c == want[r.u], (r.u, r.c, want[r.u])


def test_r10_sql_udfs_match_dataframe_functions(spark):
    """The r10 SQL surface (luhn_valid / iban_valid / html_strip) must
    agree row-for-row with the DataFrame builders on mixed inputs —
    the two-surface drift pin."""
    from quickstart_streaming_agents_spark.functions.text import (
        html_text_extract,
        iban_valid,
        luhn_valid,
    )
    from quickstart_streaming_agents_spark.sql import register_curation_sql

    register_curation_sql(spark)
    pans = ["4111111111111111", "4111111111111112", "378282246310005",
            "1234567890123", "6011000990139424"]
    df = spark.createDataFrame([(p,) for p in pans], ["d"])
    df.createOrReplaceTempView("pans")
    sql_v = {r.d: r.ok for r in
             spark.sql("SELECT d, luhn_valid(d) AS ok FROM pans").collect()}
    df_v = {r.d: r.ok for r in
            df.select("d", luhn_valid(F.col("d")).alias("ok")).collect()}
    assert sql_v == df_v and sql_v["4111111111111111"] is True

    ibans = ["DE89370400440532013000", "DE90370400440532013000",
             "GB29NWBK60161331926819", "ZZ00REF0001234567"]
    df2 = spark.createDataFrame([(s,) for s in ibans], ["s"])
    df2.createOrReplaceTempView("ibans")
    sql_i = {r.s: r.ok for r in
             spark.sql("SELECT s, iban_valid(s) AS ok FROM ibans").collect()}
    df_i = {r.s: r.ok for r in
            df2.select("s", iban_valid(F.col("s")).alias("ok")).collect()}
    assert sql_i == df_i and sql_i["DE89370400440532013000"] is True

    html = [
        '<script>var x = "<p>decoy</p>";</script><p>keep</p>',
        "a &amp;lt; b &gt; c &quot;d&quot;",
        "<H1>Case</H1> <!-- c -->tail",
    ]
    df3 = spark.createDataFrame([(h,) for h in html], ["t"])
    df3.createOrReplaceTempView("pages")
    sql_h = [r.o for r in
             spark.sql("SELECT html_strip(t) AS o FROM pages").collect()]
    df_h = [r.o for r in
            df3.select(html_text_extract("t").alias("o")).collect()]
    assert sql_h == df_h
