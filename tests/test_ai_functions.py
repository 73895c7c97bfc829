"""ml_predict / vector_search / agent loop behavior tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.agents import (
    ai_run_agent,
    ai_tool_invoke,
    run_agent_once,
)
from quickstart_streaming_agents_spark.functions.ml import ml_predict
from quickstart_streaming_agents_spark.functions.vector import (
    vector_search,
    vector_search_flat,
)
from quickstart_streaming_agents_spark.providers import fake_embedding, fake_textgen
from quickstart_streaming_agents_spark.registries import (
    DEFAULT_CATALOG,
    Agent,
    Model,
    Tool,
)
from quickstart_streaming_agents_spark.session import ship_package
from tests.conftest import SF_DIR


def test_fake_embedding_deterministic_unit():
    m = Model(name="e", task="embedding", embedding_dim=64)
    a = fake_embedding(["hello"], m)[0]
    b = fake_embedding(["hello"], m)[0]
    assert a == b and len(a) == 64
    assert abs(sum(x * x for x in a) - 1.0) < 1e-5
    assert fake_embedding(["other"], m)[0] != a


def test_fake_textgen_verdict_mode():
    m = DEFAULT_CATALOG.models["fake_textgen"]
    out = fake_textgen(["Decide. Verdicts must be one of: [APPROVE, DENY_FRAUD]"], m)[0]
    assert "**Verdict:**" in out
    assert any(v in out for v in ("APPROVE", "DENY_FRAUD"))


def test_pick_verdict_five_value_set():
    """LAB4 spelling: every listed verdict must be reachable, including
    the one after 'or' (r13 regression: the old token-wise capture under
    re.I matched the literal 'or' as a choice and dropped DENY_FRAUD —
    test_lab4.py:37-43's five-value contract silently lost a value),
    and the pick must be md5(text) % 5 over the listed order (the
    lab4_chain oracle replays exactly that)."""
    import hashlib

    from quickstart_streaming_agents_spark.providers import pick_verdict_choice

    tmpl = ("The Verdict line must contain exactly one word: APPROVE, "
            "APPROVE_PARTIAL, REQUEST_DOCS, DENY_INELIGIBLE, or "
            "DENY_FRAUD.\nCase {}")
    choices = ["APPROVE", "APPROVE_PARTIAL", "REQUEST_DOCS",
               "DENY_INELIGIBLE", "DENY_FRAUD"]
    seen = set()
    for i in range(64):
        t = tmpl.format(i)
        pick = pick_verdict_choice(t)
        assert pick == choices[
            int(hashlib.md5(t.encode()).hexdigest(), 16) % 5
        ]
        seen.add(pick)
    assert seen == set(choices)


def test_ml_predict_embedding_column(spark):
    ship_package(spark)
    m = DEFAULT_CATALOG.models["fake_embedding"]
    df = spark.createDataFrame([("a",), ("b",)], "text string")
    rows = df.withColumn("emb", ml_predict(m, "text")).collect()
    assert all(len(r["emb"]) == 64 for r in rows)
    assert rows[0]["emb"] != rows[1]["emb"]


def test_vector_search_finds_self(spark):
    ship_package(spark)
    from quickstart_streaming_agents_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # without self-exclusion the best match of a vector is itself, score ≈ 1
    out = vector_search(q, emb, "embedding", k=1).collect()
    for r in out:
        hit = r["search_results"][0]
        assert hit["vec_id"] == r["query_id"]
        assert abs(hit["score"] - 1.0) < 1e-9


def test_vector_search_flat_columns(spark):
    ship_package(spark)
    from quickstart_streaming_agents_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = vector_search_flat(q, emb, "embedding", k=3, id_col="vec_id", text_col=None)
    assert {"vec_id_1", "score_1", "vec_id_3", "score_3"} <= set(out.columns)
    assert out.count() == 3


def test_agent_loop_success_uses_all_tools():
    agent = Agent(
        name="a",
        model=DEFAULT_CATALOG.models["fake_textgen"],
        prompt="Verdicts must be one of: [PRICE_MATCH, NO_MATCH]",
        tools=(Tool(name="t", allowed_tools=("http_get", "send_email")),),
    )
    status, response = run_agent_once(agent, "check order 1")
    assert status == "SUCCESS"
    assert "Verdict" in response


def test_agent_loop_failure_bound():
    agent = Agent(
        name="a",
        model=DEFAULT_CATALOG.models["fake_textgen"],
        prompt="p",
        tools=(Tool(name="t", allowed_tools=("always_fails",)),),
        max_consecutive_failures=2,
    )
    status, response = run_agent_once(agent, "x")
    assert status == "FAILURE"
    assert "consecutive tool failures" in response


def test_agent_max_iterations_bound():
    # a tool-less agent whose fake model would loop forever on tools can't:
    # with no allowed tools it answers immediately; instead bound-check via
    # an agent whose allowed tool list is huge
    agent = Agent(
        name="a",
        model=DEFAULT_CATALOG.models["fake_textgen"],
        prompt="p",
        tools=(Tool(name="t", allowed_tools=tuple(f"http_get{i}" for i in range(50))),),
        max_iterations=3,
        max_consecutive_failures=100,
    )
    status, response = run_agent_once(agent, "x")
    assert status == "FAILURE"
    assert "max_iterations" in response


def test_ai_run_agent_dataframe(spark):
    ship_package(spark)
    agent = Agent(
        name="a",
        model=DEFAULT_CATALOG.models["fake_textgen"],
        prompt="Verdicts must be one of: [APPROVE, DENY]",
        tools=(Tool(name="t", allowed_tools=("http_get",)),),
    )
    df = spark.createDataFrame([("claim 1",), ("claim 2",)], "prompt string")
    rows = df.withColumn("r", ai_run_agent(agent, "prompt")).collect()
    assert all(r["r"]["status"] == "SUCCESS" for r in rows)
    assert all("Verdict" in r["r"]["response"] for r in rows)


def test_ai_tool_invoke(spark):
    ship_package(spark)
    m = DEFAULT_CATALOG.models["fake_textgen"]
    df = spark.createDataFrame([("q",)], "prompt string")
    r = df.withColumn(
        "t", ai_tool_invoke(m, "prompt", (Tool(name="t", allowed_tools=("http_get",)),))
    ).collect()[0]["t"]
    assert r["tool_name"] == "http_get"
    assert "HTTP 200" in r["result"]


def test_catalog_save_load_round_trip(tmp_path):
    """EngineCatalog JSON persistence: DDL objects survive a session with
    nested references re-linked by name."""
    from quickstart_streaming_agents_spark.registries import EngineCatalog

    cat = EngineCatalog()
    conn = cat.create_connection(
        "mcp", type="mcp_server", endpoint="http://localhost:9",
        credentials=(("api_key", "k"),),
    )
    cat.create_model("m", provider="fake", task="text_generation",
                     params=(("max_tokens", "100"),), connection=conn)
    cat.create_tool("t", connection=conn, allowed_tools=("http_get",),
                    request_timeout=7.0)
    cat.create_agent("a", model="m", prompt="p", tools=(cat.tools["t"],),
                     max_iterations=3, max_consecutive_failures=1)

    path = str(tmp_path / "catalog.json")
    cat.save(path)
    back = EngineCatalog.load(path)

    assert back.describe() == cat.describe()
    assert back.models["m"] == cat.models["m"]
    assert back.tools["t"] == cat.tools["t"]
    assert back.agents["a"] == cat.agents["a"]
    # nested refs are re-linked to the loaded connection object
    assert back.models["m"].connection is back.connections["mcp"]


def test_ml_predict_cached_matches_direct_and_dedups_calls(spark):
    """Cache hits reuse the stored response, misses match a direct
    ml_predict bit for bit, and the provider-facing side is the DISTINCT
    missed prompts only (new_entries cardinality == distinct misses)."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.functions.ml import (
        ml_predict,
        ml_predict_cached,
    )
    from quickstart_streaming_agents_spark.registries import DEFAULT_CATALOG

    model = DEFAULT_CATALOG.models["fake_textgen"]
    # 300 rows over 30 distinct templated prompts, 12 of them pre-cached
    rows = spark.range(300).select(
        F.col("id").alias("row_id"),
        F.concat(F.lit("Describe entity "), (F.col("id") % 30).cast("string"))
         .alias("prompt"),
        (F.col("id") % 30).alias("ent"),
    )
    seed = rows.filter(F.col("ent") < 12).select("prompt").distinct()
    cache = seed.select(
        F.md5("prompt").alias("prompt_hash"),
        ml_predict(model, "prompt").alias("response"),
    )
    result, new_entries = ml_predict_cached(
        rows.drop("ent"), model, "prompt", cache
    )
    got = {r.row_id: (r.cache_hit, r.response) for r in result.collect()}
    want_resp = {
        r.row_id: r.response
        for r in rows.withColumn("response", ml_predict(model, "prompt"))
                     .collect()
    }
    assert len(got) == 300
    for rid, (hit, resp) in got.items():
        assert resp == want_resp[rid]
        assert hit == (rid % 30 < 12)
    # provider-facing dedup: exactly the 18 distinct missed prompts
    entries = new_entries.collect()
    assert len(entries) == 18
    assert all(e.response.startswith("FAKE[fake_textgen]:") for e in entries)


def test_ml_predict_cached_edges_all_hit_and_empty_cache(spark):
    """All-hit leaves new_entries empty; an empty cache misses every row
    but still answers correctly (the cold-start path)."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.functions.ml import (
        ml_predict,
        ml_predict_cached,
    )
    from quickstart_streaming_agents_spark.registries import DEFAULT_CATALOG

    model = DEFAULT_CATALOG.models["fake_textgen"]
    rows = spark.range(40).select(
        F.col("id").alias("row_id"),
        F.concat(F.lit("Entity "), (F.col("id") % 4).cast("string"))
         .alias("prompt"),
    )
    full = rows.select("prompt").distinct().select(
        F.md5("prompt").alias("prompt_hash"),
        ml_predict(model, "prompt").alias("response"),
    )
    res_all, delta_all = ml_predict_cached(rows, model, "prompt", full)
    assert delta_all.count() == 0
    assert all(r.cache_hit for r in res_all.collect())

    empty = full.filter(F.lit(False))
    res_none, delta_none = ml_predict_cached(rows, model, "prompt", empty)
    out = res_none.collect()
    assert all(not r.cache_hit for r in out)
    assert all(r.response.startswith("FAKE[fake_textgen]:") for r in out)
    assert delta_none.count() == 4


def test_ml_predict_cached_null_prompts_and_duplicate_cache_keys(spark):
    """NULL prompts must get the provider's empty-prompt response (the
    plain ml_predict contract), not a silent NULL; duplicate prompt_hash
    rows in an un-compacted cache snapshot must not fan out the probe
    join."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.functions.ml import (
        ml_predict,
        ml_predict_cached,
    )
    from quickstart_streaming_agents_spark.registries import DEFAULT_CATALOG

    model = DEFAULT_CATALOG.models["fake_textgen"]
    rows = spark.createDataFrame(
        [(0, "Entity A"), (1, None), (2, "Entity A"), (3, None)],
        "row_id long, prompt string",
    )
    # un-compacted snapshot: the same key appended twice
    seed = spark.createDataFrame([("Entity A",)], "prompt string")
    one = seed.select(
        F.md5("prompt").alias("prompt_hash"),
        ml_predict(model, "prompt").alias("response"),
    )
    cache = one.unionAll(one)
    result, delta = ml_predict_cached(rows, model, "prompt", cache)
    got = {r.row_id: (r.cache_hit, r.response) for r in result.collect()}
    assert len(got) == 4  # duplicate cache keys did not fan out
    want_empty = ml_predict(model, F.lit("")).alias("r")
    empty_resp = spark.range(1).select(want_empty).first()[0]
    assert got[0] == (True, got[0][1]) and got[2] == got[0]
    assert got[1] == (False, empty_resp)  # NULL → provider("") response
    assert got[3] == got[1]
    # one distinct miss (the NULL/"" class), nothing else
    d = delta.collect()
    assert len(d) == 1 and d[0].response == empty_resp
    delta.unpersist()


def test_tracked_persists_release_between_queries(spark):
    """The bench between-query hook must actually free the cached-
    inference delta: after ml_predict_cached materializes, the tracked
    persist count drains to zero and the frame is no longer cached."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.functions.ml import (
        ml_predict_cached,
    )
    from quickstart_streaming_agents_spark.registries import DEFAULT_CATALOG
    from quickstart_streaming_agents_spark.runtime import (
        _TRACKED_PERSISTS,
        release_tracked_persists,
    )

    release_tracked_persists()  # clean slate
    model = DEFAULT_CATALOG.models["fake_textgen"]
    rows = spark.range(20).select(
        F.col("id").alias("row_id"),
        F.concat(F.lit("Q "), (F.col("id") % 5).cast("string")).alias("prompt"),
    )
    empty_cache = spark.createDataFrame([], "prompt_hash string, response string")
    result, delta = ml_predict_cached(rows, model, "prompt", empty_cache)
    assert result.count() == 20 and delta.count() == 5
    assert len(_TRACKED_PERSISTS) == 1
    assert delta.storageLevel.useMemory  # actually persisted
    released = release_tracked_persists()
    assert released == 1 and not _TRACKED_PERSISTS
    assert not delta.storageLevel.useMemory  # actually freed


def test_ml_predict_cached_null_response_rows_treated_absent(spark):
    """ADVICE r13: a cache row whose response is NULL must be treated as
    ABSENT — filtered before the dedup pick, so (a) a repaired non-NULL
    duplicate always wins over the broken NULL row, and (b) a hash
    present ONLY with a NULL response re-invokes the provider and lands
    a fresh non-NULL entry in new_entries (one-time repair under
    compaction, not an eternal NULL win)."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.functions.ml import (
        ml_predict,
        ml_predict_cached,
    )
    from quickstart_streaming_agents_spark.registries import DEFAULT_CATALOG

    model = DEFAULT_CATALOG.models["fake_textgen"]
    rows = spark.createDataFrame(
        [(0, "Entity A"), (1, "Entity B"), (2, "Entity C")],
        "row_id long, prompt string",
    )
    good = spark.createDataFrame([("Entity A",)], "prompt string").select(
        F.md5("prompt").alias("prompt_hash"),
        ml_predict(model, "prompt").alias("response"),
    )
    broken = spark.createDataFrame(
        [("Entity A",), ("Entity B",)], "prompt string"
    ).select(
        F.md5("prompt").alias("prompt_hash"),
        F.lit(None).cast("string").alias("response"),
    )
    # NULL rows appended on BOTH sides of the good row: whichever side
    # the arbitrary dedup pick scans from, the non-NULL row must win
    cache = broken.unionAll(good).unionAll(broken)
    result, delta = ml_predict_cached(rows, model, "prompt", cache)
    got = {r.row_id: (r.cache_hit, r.response) for r in result.collect()}
    direct = {
        r.p: r.r
        for r in spark.createDataFrame(
            [("Entity A",), ("Entity B",), ("Entity C",)], "p string"
        ).select("p", ml_predict(model, "p").alias("r")).collect()
    }
    assert got[0] == (True, direct["Entity A"])    # repaired dup wins
    assert got[1] == (False, direct["Entity B"])   # NULL-only = miss
    assert got[2] == (False, direct["Entity C"])   # plain miss
    d = {r.prompt_hash: r.response for r in delta.collect()}
    assert len(d) == 2 and all(v is not None for v in d.values())
    delta.unpersist()


def test_persist_scope_mark_releases_only_scoped(spark):
    """ADVICE r13: a scoped release (persist_scope_mark + since=) must
    leave persists registered BEFORE the mark untouched — the streaming
    pipeline's per-batch release must not unpersist a concurrent batch
    caller's pending delta."""
    from quickstart_streaming_agents_spark.runtime import (
        _TRACKED_PERSISTS,
        persist_scope_mark,
        release_tracked_persists,
        track_persist,
    )

    release_tracked_persists()  # clean slate
    outer = track_persist(spark.range(10).persist())
    outer.count()
    mark = persist_scope_mark()
    assert mark == 1
    inner = track_persist(spark.range(20).persist())
    inner.count()
    released = release_tracked_persists(since=mark)
    assert released == 1
    assert not inner.storageLevel.useMemory      # scoped: released
    assert outer.storageLevel.useMemory          # pre-mark: untouched
    assert len(_TRACKED_PERSISTS) == 1
    assert release_tracked_persists() == 1       # default: drains all
    assert not outer.storageLevel.useMemory
