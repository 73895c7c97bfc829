"""SQL-script runner: statement splitting, Flink AI-DDL parsing, lateral
rewrites, and a lab1-shaped script end-to-end (the reference's EP2 path —
walkthrough SQL blocks executed statement-by-statement)."""

from __future__ import annotations

from quickstart_streaming_agents_spark.registries import EngineCatalog
from quickstart_streaming_agents_spark.script import (
    rewrite_laterals,
    run_sql_script,
    split_statements,
)
from quickstart_streaming_agents_spark.session import ship_package
from quickstart_streaming_agents_spark.sources.parquet import register_views
from quickstart_streaming_agents_spark.sql import register_engine_sql

from .conftest import SF_DIR


def test_split_statements_strings_and_comments():
    script = """
    -- leading comment; with a semicolon
    SELECT 'a;b' AS x;
    SET 'sql.state-ttl' = '1 HOURS';  -- trailing
    SELECT 'it''s;fine'
    """
    stmts = split_statements(script)
    assert len(stmts) == 3
    assert stmts[0] == "SELECT 'a;b' AS x"
    assert stmts[2] == "SELECT 'it''s;fine'"


def test_rewrite_laterals_flink_to_spark():
    got = rewrite_laterals(
        "SELECT q.query, r.response FROM queries q, "
        "LATERAL TABLE(ML_PREDICT('m', CONCAT('a (b) ', q.query))) r"
    )
    assert got == (
        "SELECT q.query, r.response FROM queries q, "
        "LATERAL ml_predict_t('m', CONCAT('a (b) ', q.query)) r"
    )
    got = rewrite_laterals(
        "SELECT * FROM t, LATERAL TABLE(VECTOR_SEARCH_AGG(docs, "
        "DESCRIPTOR(embedding), t.q, 3)) AS v"
    )
    assert got == "SELECT * FROM t, LATERAL vector_search_agg_docs(t.q, 3) AS v"


def test_rewrite_search_results_index_is_one_based_null_safe():
    from quickstart_streaming_agents_spark.script import (
        rewrite_search_results_index,
    )

    got = rewrite_search_results_index(
        "SELECT vs.search_results[1].chunk, search_results[2].score FROM t"
    )
    assert got == (
        "SELECT try_element_at(vs.search_results, 1).chunk, "
        "try_element_at(search_results, 2).score FROM t"
    )
    # other arrays keep Spark semantics untouched
    assert rewrite_search_results_index("SELECT arr[1] FROM t") == \
        "SELECT arr[1] FROM t"
    # a LONGER identifier merely ending in search_results is not the
    # corpus column — suffix matches must not fire
    assert rewrite_search_results_index(
        "SELECT foo_search_results[1], a.bar_search_results[2] FROM t"
    ) == "SELECT foo_search_results[1], a.bar_search_results[2] FROM t"


def test_ai_ddl_populates_catalog(spark):
    cat = EngineCatalog()
    run_sql_script(spark, """
        CREATE CONNECTION mcp_conn WITH (
            'type' = 'mcp_server', 'endpoint' = 'http://localhost:9/mcp');
        CREATE MODEL claims_model INPUT (prompt STRING) OUTPUT (response STRING)
            WITH ('provider' = 'fake', 'task' = 'text_generation',
                  'fake.params.max_tokens' = '50000');
        CREATE MODEL embed_model INPUT (text STRING) OUTPUT (embedding ARRAY<FLOAT>)
            WITH ('provider' = 'fake');
        CREATE TOOL web_tool USING CONNECTION mcp_conn WITH (
            'type' = 'mcp', 'allowed_tools' = 'http_get, send_email',
            'request_timeout' = '30');
        CREATE AGENT price_agent USING MODEL claims_model
            USING PROMPT 'You are a price-match agent; it''s strict.'
            USING TOOLS web_tool
            WITH ('max_iterations' = '10', 'max_consecutive_failures' = '2');
    """, catalog=cat)
    assert cat.connections["mcp_conn"].type == "mcp_server"
    m = cat.models["claims_model"]
    assert m.task == "text_generation" and m.param("fake.params.max_tokens") == "50000"
    assert cat.models["embed_model"].task == "embedding"  # inferred from OUTPUT
    t = cat.tools["web_tool"]
    assert t.allowed_tools == ("http_get", "send_email") and t.request_timeout == 30.0
    a = cat.agents["price_agent"]
    assert a.model is m and a.tools == (t,)
    assert a.prompt == "You are a price-match agent; it's strict."
    assert a.max_iterations == 10

    # S12: DROP works through the script path too
    run_sql_script(spark, "DROP AGENT price_agent; DROP TOOL web_tool", catalog=cat)
    assert "price_agent" not in cat.agents and "web_tool" not in cat.tools


def test_lab1_shaped_script_end_to_end(spark):
    """CTAS chain + SET no-op + INSERT VALUES + lateral ML_PREDICT in the
    reference's own (Flink) spelling, executed as one script."""
    ship_package(spark)
    register_views(spark, SF_DIR)
    register_engine_sql(spark)

    results = run_sql_script(spark, """
        SET 'sql.state-ttl' = '1 HOURS';
        CREATE TABLE enriched_orders_s AS
            SELECT o.o_orderkey AS order_key, c.c_name AS customer_name,
                   o.o_totalprice AS order_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey;
        INSERT INTO enriched_orders_s VALUES (-1, 'synthetic buyer', 0.0);
        CREATE TABLE price_match_prompts AS
            SELECT order_key, r.response
            FROM enriched_orders_s,
                 LATERAL TABLE(ML_PREDICT('fake_textgen',
                     CONCAT('Price match for ', customer_name))) r
            WHERE order_key < 100;
        SELECT * FROM price_match_prompts;
    """)
    kinds = [r.kind for r in results]
    assert kinds == ["set", "ctas", "insert", "ctas", "select"]
    assert results[0].info == {"value": "1 HOURS", "applied": False}

    n_orders = spark.table("orders").count()
    assert spark.table("enriched_orders_s").count() == n_orders + 1
    rows = results[-1].df.collect()
    assert 0 < len(rows) < n_orders
    assert all(r.response for r in rows)
    # the synthetic INSERT row flowed through the lateral model call
    assert any(r.order_key == -1 for r in rows)


def test_ctas_primary_key_and_props_recorded(spark):
    results = run_sql_script(spark, """
        CREATE TABLE keyed_t (PRIMARY KEY (k) NOT ENFORCED)
        WITH ('changelog.mode' = 'append') AS
        SELECT 1 AS k, 'x' AS v
    """)
    r = results[0]
    assert r.kind == "ctas" and r.name == "keyed_t"
    assert r.info["key"] == "k"
    assert r.info["props"] == {"changelog.mode": "append"}
    assert spark.table("keyed_t").count() == 1


def test_tumble_tvf_rewrite_matches_dataframe_tumble(spark):
    """LAB3-shaped TUMBLE TVF SQL (LAB3-Walkthrough.md:99-112 spelling)
    through run_sql_script must equal operators/windows.tumble."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.windows import tumble
    from quickstart_streaming_agents_spark.sources.parquet import load_table

    ship_package(spark)
    register_views(spark, SF_DIR)
    results = run_sql_script(spark, """
        CREATE TABLE requests_per_type AS
        SELECT window_start, window_end, event_type,
               COUNT(*) AS total_requests, window_time
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES))
        GROUP BY window_start, window_end, window_time, event_type;
    """)
    got = {(r.window_start, r.event_type): (r.total_requests, r.window_time)
           for r in results[0].df.collect()}

    events = load_table(spark, SF_DIR, "events")
    want_df = tumble(events, "ts", "5 minutes", keys=["event_type"],
                     aggs=[F.count("*").alias("total_requests")])
    want = {(r.window_start, r.event_type): (r.total_requests, r.window_time)
            for r in want_df.collect()}
    assert got == want and len(got) > 0


def test_hop_tvf_rewrite_matches_dataframe_sliding(spark):
    """HOP TVF (Flink arg order: slide, then size) through run_sql_script
    must equal the native window(ts, size, slide) DataFrame aggregation."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.sources.parquet import load_table

    register_views(spark, SF_DIR)
    results = run_sql_script(spark, """
        CREATE TABLE hop_counts AS
        SELECT window_start, window_end, event_type,
               COUNT(*) AS total_requests, window_time
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       INTERVAL '5' MINUTES, INTERVAL '10' MINUTES))
        GROUP BY window_start, window_end, window_time, event_type;
    """)
    got = {(r.window_start, r.event_type): (r.total_requests, r.window_time)
           for r in results[0].df.collect()}

    events = load_table(spark, SF_DIR, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    want_df = (
        events.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("total_requests"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "total_requests",
                (F.col("w.end") - F.expr("INTERVAL 1 MILLISECOND")).alias("window_time"))
    )
    want = {(r.window_start, r.event_type): (r.total_requests, r.window_time)
            for r in want_df.collect()}
    assert got == want and len(got) > 0


def test_cumulate_tvf_rewrite_semantics(spark):
    """CUMULATE (Flink arg order: step, then size): growing windows within
    each size bucket; a row appears in every cumulative window whose end is
    strictly after its timestamp."""
    spark.sql("""
        SELECT * FROM VALUES
          (timestamp'2024-01-01 00:07:00', 'a'),
          (timestamp'2024-01-01 00:12:00', 'a'),
          (timestamp'2024-01-01 00:17:00', 'b')
        AS cum_t(ts, k)
    """).createOrReplaceTempView("cum_t")
    results = run_sql_script(spark, """
        CREATE TABLE cum_counts AS
        SELECT window_start, window_end, COUNT(*) AS n
        FROM TABLE(CUMULATE(TABLE cum_t, DESCRIPTOR(ts),
                            INTERVAL '5' MINUTES, INTERVAL '15' MINUTES))
        GROUP BY window_start, window_end;
    """)
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    got = {(r.window_start, r.window_end): r.n for r in results[0].df.collect()}
    assert got == {
        # bucket [00:00, 00:15): row@07 in ends {10, 15}; row@12 in {15}
        (base, base + dt.timedelta(minutes=10)): 1,
        (base, base + dt.timedelta(minutes=15)): 2,
        # bucket [00:15, 00:30): row@17 in ends {20, 25, 30}
        (base + dt.timedelta(minutes=15), base + dt.timedelta(minutes=20)): 1,
        (base + dt.timedelta(minutes=15), base + dt.timedelta(minutes=25)): 1,
        (base + dt.timedelta(minutes=15), base + dt.timedelta(minutes=30)): 1,
    }


def test_ml_detect_anomalies_over_sql_matches_operator(spark):
    """The flagship lab statement — TUMBLE + ML_DETECT_ANOMALIES(…) OVER
    (PARTITION BY … ORDER BY …) + anomaly_result field access + is_anomaly
    filter, in the reference's own spelling (LAB3-Walkthrough.md:147-198,
    LAB4-Walkthrough.md:126-179) — through run_sql_script must equal the
    DataFrame pipeline tumble → operators/anomaly.ml_detect_anomalies."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.operators.anomaly import (
        ml_detect_anomalies,
    )
    from quickstart_streaming_agents_spark.operators.windows import tumble
    from quickstart_streaming_agents_spark.sources.parquet import load_table

    ship_package(spark)
    register_views(spark, SF_DIR)
    results = run_sql_script(spark, """
        CREATE TABLE anomalies_per_type AS
        WITH windowed_traffic AS (
            SELECT window_start, window_end, window_time, event_type,
                   COUNT(*) AS request_count
            FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOURS))
            GROUP BY window_start, window_end, window_time, event_type
        ),
        anomaly_detection AS (
            SELECT window_time, event_type, request_count,
                ML_DETECT_ANOMALIES(
                    CAST(request_count AS DOUBLE),
                    window_time,
                    JSON_OBJECT(
                        'minTrainingSize' VALUE 8,
                        'maxTrainingSize' VALUE 50,
                        'confidencePercentage' VALUE 95.0,
                        'enableStl' VALUE FALSE
                    )
                ) OVER (
                    PARTITION BY event_type
                    ORDER BY window_time
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS anomaly_result
            FROM windowed_traffic
        )
        SELECT event_type, window_time, request_count,
               CAST(ROUND(anomaly_result.forecast_value) AS BIGINT)
                   AS expected_requests,
               anomaly_result.upper_bound AS upper_bound,
               anomaly_result.is_anomaly AS is_surge
        FROM anomaly_detection;
        CREATE TABLE surges_per_type AS
        SELECT event_type, window_time, request_count
        FROM anomalies_per_type
        WHERE is_surge = true AND request_count > upper_bound;
    """)
    assert [r.kind for r in results] == ["ctas", "ctas"]

    def canon(rows):
        return sorted(
            (r.event_type, r.window_time, r.request_count,
             r.expected_requests,
             None if r.upper_bound is None else round(r.upper_bound, 6),
             r.is_surge)
            for r in rows
        )

    got = canon(results[0].df.collect())

    events = load_table(spark, SF_DIR, "events")
    agg = tumble(events, "ts", "1 hour", keys=["event_type"],
                 aggs=[F.count("*").alias("request_count")])
    scored = ml_detect_anomalies(
        agg, "request_count", "window_time", ["event_type"],
        min_training_size=8, max_training_size=50,
        confidence_percentage=95.0, detector="ar",
    )
    want_df = scored.select(
        "event_type", "window_time", "request_count",
        F.round(F.col("anomaly_result.forecast_value")).cast("long")
            .alias("expected_requests"),
        F.col("anomaly_result.upper_bound").alias("upper_bound"),
        F.col("anomaly_result.is_anomaly").alias("is_surge"),
    )
    want = canon(want_df.collect())
    assert len(got) > 50  # enough windows to actually train past min_n
    assert got == want
    # trained rows exist (bounds materialized), proving the UDF ran
    assert any(r[4] is not None for r in got)

    # the downstream filter consumed anomaly_result fields through pure SQL
    n_surges = results[1].df.count()
    want_surges = want_df.filter(
        (F.col("is_surge") == True) &  # noqa: E712
        (F.col("request_count") > F.col("upper_bound"))
    ).count()
    assert n_surges == want_surges


def test_ai_tool_invoke_sql_lab1_spelling(spark):
    """AI_TOOL_INVOKE as a SQL call with Flink MAP[…] literals
    (LAB1-Walkthrough.md:80-92) through run_sql_script."""
    ship_package(spark)
    register_engine_sql(spark)
    results = run_sql_script(spark, """
        SELECT
            AI_TOOL_INVOKE(
                'fake_textgen',
                'Use the send_email tool to send an email.',
                MAP[],
                MAP['send_email', 'Send an email via SMTP'],
                MAP['debug', 'true']
            ) AS response;
    """)
    row = results[0].df.collect()[0]
    assert row.response.tool_name == "send_email"
    assert row.response.result.startswith("EMAIL_SENT")
    assert "ok" in row.response.response

    # whitelist honored: unknown tool fails loudly, not silently
    r2 = run_sql_script(spark, """
        SELECT AI_TOOL_INVOKE('fake_textgen', 'x', MAP[],
                              MAP['no_such_tool', 'd'], MAP[]) AS response
    """)[0].df.collect()[0]
    assert "failed" in r2.response.response


def test_with_props_ignores_quoted_with_in_prompt(spark):
    """A CREATE AGENT prompt containing 'WITH (' must not shadow the real
    trailing WITH property list."""
    cat = EngineCatalog()
    run_sql_script(spark, """
        CREATE MODEL fake_textgen INPUT (prompt STRING) OUTPUT (response STRING)
            WITH ('provider' = 'fake', 'task' = 'text_generation');
        CREATE AGENT tricky_agent USING MODEL fake_textgen
            USING PROMPT 'Respond WITH (exactly) one word; end WITH (a dot).'
            WITH ('max_iterations' = '4', 'max_consecutive_failures' = '1');
    """, catalog=cat)
    a = cat.agents["tricky_agent"]
    assert a.max_iterations == 4 and a.max_consecutive_failures == 1
    assert "WITH (exactly)" in a.prompt


def test_cumulate_dataframe_matches_sql_rewrite(spark):
    """operators/windows.cumulate ≡ the script path's CUMULATE rewrite on
    the events fixture."""
    from quickstart_streaming_agents_spark.queries import QUERIES
    from quickstart_streaming_agents_spark.script import rewrite_flink
    from quickstart_streaming_agents_spark.sources.parquet import load_table

    from .conftest import SF_DIR

    load_table(spark, SF_DIR, "events").createOrReplaceTempView("cum_ev")
    sql = rewrite_flink(
        """
        SELECT window_start, window_end, window_time, event_type,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM TABLE(CUMULATE(TABLE cum_ev, DESCRIPTOR(ts),
                            INTERVAL '1' HOUR, INTERVAL '6' HOUR))
        GROUP BY window_start, window_end, window_time, event_type
        """
    )
    got = {tuple(r) for r in spark.sql(sql).collect()}
    want = {tuple(r) for r in QUERIES["cumulate_agg"](spark, SF_DIR).collect()}
    assert got == want and len(got) > 0


def test_corpus_shaped_ddl_backticks_comment_uppercase(spark):
    """The reference's emitted DDL uses backticked identifiers, a COMMENT
    clause between USING TOOLS and WITH, and uppercase property keys
    (scripts/common/sql_extractors.py:255, LAB1-Walkthrough.md:141-181) —
    all must parse to the real names, tools, and params."""
    cat = EngineCatalog()
    run_sql_script(spark, """
        CREATE CONNECTION IF NOT EXISTS `remote-mcp-connection` WITH (
            'type' = 'mcp_server', 'endpoint' = 'http://localhost:9/mcp');
        CREATE MODEL `price_model` INPUT (prompt STRING) OUTPUT (response STRING)
            WITH ('provider' = 'fake', 'task' = 'text_generation');
        CREATE TOOL `lab1_remote_mcp` USING CONNECTION `remote-mcp-connection`
            WITH ('type' = 'mcp', 'allowed_tools' = 'http_get');
        CREATE AGENT `price_match_agent` USING MODEL `price_model`
            USING PROMPT 'find prices'
            USING TOOLS `lab1_remote_mcp`
            COMMENT 'agent for price matching'
            WITH ('MAX_ITERATIONS' = '3');
    """, catalog=cat)
    assert "remote-mcp-connection" in cat.connections
    agent = cat.agents["price_match_agent"]
    assert [t.name for t in agent.tools] == ["lab1_remote_mcp"]
    assert agent.max_iterations == 3


def test_corpus_shaped_lateral_calls(spark):
    """LAB1's 3-arg ML_PREDICT with a MAP settings literal and LAB3's
    AI_RUN_AGENT with a backticked agent name + extra context column must
    run, not fail on arity or unresolved identifiers."""
    cat = EngineCatalog()
    ship_package(spark)
    run_sql_script(spark, """
        CREATE MODEL `llm_textgen_model` INPUT (prompt STRING)
            OUTPUT (response STRING) WITH ('provider' = 'fake');
        CREATE AGENT `boat_dispatch_agent` USING MODEL `llm_textgen_model`
            USING PROMPT 'dispatch boats';
    """, catalog=cat)
    spark.createDataFrame(
        [("why no boats", "zone_a")], "question string, zone string"
    ).createOrReplaceTempView("lab3_q")
    out = run_sql_script(spark, """
        SELECT q.question, r.response FROM lab3_q q,
        LATERAL TABLE(ML_PREDICT('llm_textgen_model', q.question,
                                 MAP['debug', 'true'])) r;
        SELECT q.zone, a.status, a.response FROM lab3_q q,
        LATERAL TABLE(AI_RUN_AGENT(`boat_dispatch_agent`, q.question, q.zone)) a
    """, catalog=cat)
    r1 = out[-2].df.collect()
    r2 = out[-1].df.collect()
    assert len(r1) == 1 and r1[0].response
    assert len(r2) == 1 and r2[0].status == "SUCCESS"
    assert "zone_a" in r2[0].response  # context column reached the agent


def test_cumulate_rewrite_unique_columns(spark):
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.script import rewrite_cumulate

    spark.createDataFrame(
        [("2024-01-01 00:01:00", 1.0)], "ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp")) \
        .createOrReplaceTempView("cum_t")
    df = spark.sql(rewrite_cumulate(
        "SELECT * FROM TABLE(CUMULATE(TABLE cum_t, DESCRIPTOR(ts), "
        "INTERVAL '5' MINUTES, INTERVAL '10' MINUTES))"
    ))
    assert len(df.columns) == len(set(df.columns)), df.columns


def test_insert_with_column_list(spark):
    out = run_sql_script(spark, """
        CREATE TABLE ins_t AS SELECT 1 AS a, 'x' AS b;
        INSERT INTO ins_t(a, b) VALUES (2, 'y')
    """, catalog=EngineCatalog())
    rows = sorted((r.a, r.b) for r in out[-1].df.collect())
    assert rows == [(1, "x"), (2, "y")]


def test_escaped_literals_restored_after_script_even_on_error(spark):
    """run_sql_script flips the session to standard-SQL literal semantics
    (Flink parity — see its docstring) and MUST restore the caller's
    setting even when a statement throws mid-script."""
    import pytest as _pytest

    key = "spark.sql.parser.escapedStringLiterals"
    spark.conf.set(key, "false")
    with _pytest.raises(Exception):
        run_sql_script(spark, "SELECT * FROM table_that_does_not_exist_xyz")
    assert spark.conf.get(key) == "false"
    # inside a script, backslashes reach the regex engine intact
    out = run_sql_script(spark, r"""
        SELECT REGEXP_EXTRACT('Verdict: APPROVE',
                              '\*{0,2}Verdict:\s*([A-Z_]+)', 1) AS v
    """)
    assert out[0].df.collect()[0].v == "APPROVE"
