"""SQL-script entry point — run walkthrough-shaped SQL as text.

The reference's authoritative query corpus is SQL script blocks extracted
from markdown and executed statement-by-statement against Flink
(scripts/common/sql_extractors.py:283-303, testing/e2e/test_lab3.py:38-90
in /root/reference). This module gives the engine the same entry point:

    results = run_sql_script(spark, script_text, catalog=cat)

Statement handling:

- ``CREATE CONNECTION / MODEL / TOOL / AGENT`` — Flink's AI DDL is not
  Spark SQL; parsed here (same grammar as LAB1-Walkthrough.md:141-181,
  terraform/core/main.tf:461-563) into ``EngineCatalog`` objects.
- ``CREATE TABLE x [(…PRIMARY KEY…)] [WITH (…)] AS SELECT …`` — the
  batch form of the CTAS-to-topic contract: run the SELECT, register
  ``x`` as a temp view (streaming CTAS lives in StreamCatalog).
- ``INSERT INTO t SELECT … | VALUES …`` — append to the view by union.
- ``SET 'k' = 'v'`` — recorded, not applied: Flink runtime knobs
  (sql.state-ttl …) map to watermarks/output modes that our operators own.
- ``ALTER TABLE … MODIFY (WATERMARK …)`` — recorded no-op in batch; pass
  ``watermark=`` to ``StreamCatalog.read_stream`` for the streaming analog.
- ``DROP TABLE/MODEL/TOOL/AGENT/CONNECTION``, ``DESCRIBE t`` — catalog ops.
- everything else (SELECT, WITH … SELECT, SHOW …) — ``spark.sql``.

Flink's correlated-lateral AI calls are rewritten onto the engine's
registered UDTFs (sql.py) before execution::

    LATERAL TABLE(ML_PREDICT('m', p))            -> LATERAL ml_predict_t('m', p)
    LATERAL TABLE(AI_RUN_AGENT('a', p))          -> LATERAL ai_run_agent('a', p)
    LATERAL TABLE(VECTOR_SEARCH_AGG(t, DESCRIPTOR(c), q, k))
                                                 -> LATERAL vector_search_agg_t(q, k)
    (plus ``search_results[N]`` -> 1-based null-safe ``try_element_at``)

The TUMBLE/HOP/CUMULATE windowing TVFs are rewritten onto Spark's
``window()`` projection (same ``window_start``/``window_end``/
``window_time`` = end−1 ms contract as ``operators/windows.tumble``)::

    FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '5' MINUTES))
      -> FROM (SELECT *, window(ts, '5 minutes').start AS window_start, …)
    FROM TABLE(HOP(TABLE t, DESCRIPTOR(ts), slide, size))
      -> window(ts, size, slide) — Spark expands to a row per covering window
    FROM TABLE(CUMULATE(TABLE t, DESCRIPTOR(ts), step, size))
      -> bucket by window(ts, size), explode the growing window ends
         (reference never uses HOP/CUMULATE; parity completeness)

``ML_DETECT_ANOMALIES(metric, ts, JSON_OBJECT(…)) OVER (PARTITION BY k
ORDER BY ts …)`` — the flagship statement of both lab walkthroughs
(LAB3-Walkthrough.md:119-132, LAB4-Walkthrough.md:150-163) — is rewritten
onto a registered grouped-agg pandas window UDF running the same
``ar_one_step`` fit as ``operators/anomaly.ml_detect_anomalies``, with the
frame capped at ``maxTrainingSize PRECEDING`` and the ``anomaly_result``
struct rebuilt JVM-side (see ``rewrite_ml_detect_anomalies``).

"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from quickstart_streaming_agents_spark.registries import DEFAULT_CATALOG, EngineCatalog


# ---------------------------------------------------------------------------
# statement splitting
# ---------------------------------------------------------------------------

def split_statements(script: str) -> list[str]:
    """Split on top-level ``;`` respecting single-quoted strings (with ``''``
    escape) and ``--`` line comments. Mirrors the reference's extractor
    contract: one executable statement per element, no empties."""
    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(script)
    in_str = False
    in_comment = False
    while i < n:
        ch = script[i]
        if in_comment:
            if ch == "\n":
                in_comment = False
                buf.append(ch)
            i += 1
            continue
        if in_str:
            buf.append(ch)
            if ch == "'":
                if i + 1 < n and script[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    in_str = False
            i += 1
            continue
        if ch == "-" and i + 1 < n and script[i + 1] == "-":
            in_comment = True
            i += 2
            continue
        if ch == "'":
            in_str = True
            buf.append(ch)
            i += 1
            continue
        if ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    stmt = "".join(buf).strip()
    if stmt:
        out.append(stmt)
    return out


# ---------------------------------------------------------------------------
# WITH (...) property lists and quoted literals
# ---------------------------------------------------------------------------

_PROP_RE = re.compile(r"'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'")


def _unq(s: str) -> str:
    return s.replace("''", "'")


def _parse_props(block: str) -> dict[str, str]:
    """``'k' = 'v', …`` inside a WITH (…) clause. Keys are lowercased —
    the corpus mixes 'task' and 'MAX_ITERATIONS' spellings."""
    return {_unq(k).lower(): _unq(v) for k, v in _PROP_RE.findall(block)}


def _with_props(stmt: str) -> dict[str, str]:
    # Scan for `WITH (` OUTSIDE single-quoted strings — a CREATE AGENT
    # prompt may itself contain "WITH (" and must not shadow the real
    # property list. The last outside-quote occurrence is the DDL's
    # trailing WITH clause.
    open_idx = -1
    i, n = 0, len(stmt)
    while i < n:
        c = stmt[i]
        if c == "'":
            i += 1
            while i < n:
                if stmt[i] == "'":
                    if i + 1 < n and stmt[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
            i += 1
            continue
        if c in "wW" and re.match(r"WITH\s*\(", stmt[i:], re.I) and (
            i == 0 or not (stmt[i - 1].isalnum() or stmt[i - 1] == "_")
        ):
            open_idx = stmt.index("(", i)
            i = open_idx + 1
            continue
        i += 1
    if open_idx < 0:
        return {}
    close = _match_paren(stmt, open_idx)
    if close < 0:
        close = len(stmt)
    return _parse_props(stmt[open_idx + 1:close])


# ---------------------------------------------------------------------------
# Flink lateral AI calls -> engine UDTFs (sql.py)
# ---------------------------------------------------------------------------

_TUMBLE_RE = re.compile(
    r"(TABLE\s*\(\s*)?TUMBLE\s*\(\s*TABLE\s+(`?\w+`?)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,"
    r"\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)",
    re.I,
)


def rewrite_tumble(sql: str) -> str:
    """``[TABLE(]TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL 'n' UNIT)[)]`` →
    a derived table projecting ``window_start/window_end/window_time``."""
    def _sub(m: re.Match) -> str:
        tbl, ts, n, unit = m.group(2), m.group(3), m.group(4), m.group(5).lower()
        dur = f"'{n} {unit}'"
        w = f"window({ts}, {dur})"
        repl = (
            f"(SELECT *, {w}.start AS window_start, {w}.end AS window_end, "
            f"{w}.end - INTERVAL 1 MILLISECOND AS window_time FROM {tbl})"
        )
        return repl + ("\x00" if m.group(1) else "")  # marker: eat outer close

    out = _TUMBLE_RE.sub(_sub, sql)
    # drop the TABLE(…) wrapper's closing paren where the marker landed
    out = re.sub(r"\x00\s*\)", "", out)
    return out.replace("\x00", "")


_MS_PER_UNIT = {
    "second": 1_000, "seconds": 1_000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}

_HOP_RE = re.compile(
    r"(TABLE\s*\(\s*)?HOP\s*\(\s*TABLE\s+(`?\w+`?)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,"
    r"\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)",
    re.I,
)


def rewrite_hop(sql: str) -> str:
    """``[TABLE(]HOP(TABLE t, DESCRIPTOR(ts), INTERVAL 'slide' U, INTERVAL
    'size' U)[)]`` → ``window(ts, size, slide)`` projections (Spark's
    analyzer expands a sliding window to one row per covering window —
    repeated identical window() exprs dedupe into a single Expand)."""
    def _sub(m: re.Match) -> str:
        tbl, ts = m.group(2), m.group(3)
        slide = f"'{m.group(4)} {m.group(5).lower()}'"
        size = f"'{m.group(6)} {m.group(7).lower()}'"
        w = f"window({ts}, {size}, {slide})"
        repl = (
            f"(SELECT *, {w}.start AS window_start, {w}.end AS window_end, "
            f"{w}.end - INTERVAL 1 MILLISECOND AS window_time FROM {tbl})"
        )
        return repl + ("\x00" if m.group(1) else "")

    out = _HOP_RE.sub(_sub, sql)
    out = re.sub(r"\x00\s*\)", "", out)
    return out.replace("\x00", "")


_CUMULATE_RE = re.compile(
    r"(TABLE\s*\(\s*)?CUMULATE\s*\(\s*TABLE\s+(`?\w+`?)\s*,\s*DESCRIPTOR\s*\(\s*(\w+)\s*\)\s*,"
    r"\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*,\s*INTERVAL\s+'(\d+)'\s+(\w+)\s*\)",
    re.I,
)


def rewrite_cumulate(sql: str) -> str:
    """``[TABLE(]CUMULATE(TABLE t, DESCRIPTOR(ts), INTERVAL 'step' U,
    INTERVAL 'size' U)[)]`` → growing windows within each ``size`` bucket.

    Spark has no cumulate window, so derive it: bucket rows with
    ``window(ts, size)``, then explode the sequence of cumulative window
    ends the row belongs to — every ``S + k·step`` strictly after ``ts``
    up to ``S + size``. Same ``window_start/window_end/window_time``
    contract as the other window TVFs.
    """
    def _sub(m: re.Match) -> str:
        tbl, ts = m.group(2), m.group(3)
        step_n, step_u = int(m.group(4)), m.group(5).lower()
        size_n, size_u = int(m.group(6)), m.group(7).lower()
        step_ms = step_n * _MS_PER_UNIT[step_u]
        size_ms = size_n * _MS_PER_UNIT[size_u]
        if size_ms % step_ms:
            raise ValueError(
                f"CUMULATE size must be a multiple of step ({size_n} {size_u}"
                f" vs {step_n} {step_u})"
            )
        first_end = (
            f"timestamp_millis(unix_millis(w.start) + "
            f"(CAST(floor((unix_millis({ts}) - unix_millis(w.start)) / {step_ms}) AS BIGINT) + 1)"
            f" * {step_ms})"
        )
        last_end = f"timestamp_millis(unix_millis(w.start) + {size_ms})"
        repl = (
            f"(SELECT * EXCEPT (w, window_end), w.start AS window_start, window_end, "
            f"window_end - INTERVAL 1 MILLISECOND AS window_time FROM ("
            f"SELECT *, explode(sequence({first_end}, {last_end}, "
            f"INTERVAL {step_n} {step_u})) AS window_end "
            f"FROM (SELECT *, window({ts}, '{size_n} {size_u}') AS w FROM {tbl})))"
        )
        return repl + ("\x00" if m.group(1) else "")

    out = _CUMULATE_RE.sub(_sub, sql)
    out = re.sub(r"\x00\s*\)", "", out)
    return out.replace("\x00", "")


_LAT_RE = re.compile(
    r"LATERAL\s+TABLE\s*\(\s*(ML_PREDICT|AI_RUN_AGENT|VECTOR_SEARCH_AGG)\s*\(", re.I
)
_UDTF_FOR = {"ML_PREDICT": "ml_predict_t", "AI_RUN_AGENT": "ai_run_agent"}


def rewrite_flink(sql: str, spark: SparkSession | None = None) -> str:
    """All Flink-dialect rewrites: lateral AI calls, TUMBLE TVF, ``MAP[…]``
    literals, and — when a session is supplied to register the window UDF
    against — ``ML_DETECT_ANOMALIES(…) OVER (…)``."""
    sql = rewrite_map_literals(
        rewrite_cumulate(rewrite_hop(rewrite_tumble(rewrite_laterals(sql))))
    )
    sql = rewrite_search_results_index(sql)
    if spark is not None and _MDA_RE.search(sql):
        sql = rewrite_ml_detect_anomalies(sql, spark)
    return sql


# (?<![\w`]) blocks a suffix match inside a longer identifier
# (foo_search_results[1] must keep Spark semantics untouched)
_SR_INDEX_RE = re.compile(
    r"(?<![\w`])((?:`?\w+`?\.)?search_results)\s*\[\s*(\d+)\s*\]"
)


def rewrite_search_results_index(sql: str) -> str:
    """Flink array indexing is 1-based; Spark's ``arr[i]`` is 0-based. The
    corpus indexes exactly one array — VECTOR_SEARCH_AGG's
    ``search_results`` (``vs.search_results[1].chunk``,
    LAB3-Walkthrough.md:242-260, LAB4-Walkthrough.md:280-300) — so the
    rewrite is scoped to that column name and maps onto 1-based, null-safe
    ``try_element_at`` (fewer than k matches yields NULL fields, the
    vector_search_flat contract, not an INVALID_ARRAY_INDEX error)."""
    return _SR_INDEX_RE.sub(r"try_element_at(\1, \2)", sql)


_MAPLIT_RE = re.compile(r"\bMAP\s*\[", re.I)


def rewrite_map_literals(sql: str) -> str:
    """Flink ``MAP['k', 'v', …]`` bracket literals → Spark ``map('k', 'v', …)``
    (AI_TOOL_INVOKE arguments, LAB1-Walkthrough.md:88-90)."""
    while True:
        m = _MAPLIT_RE.search(sql)
        if not m:
            return sql
        close = _match_paren(sql, m.end() - 1, pair="[]")
        if close < 0:
            return sql  # malformed; leave for Spark's parser to report
        sql = sql[:m.start()] + "map(" + sql[m.end():close] + ")" + sql[close + 1:]


# ---------------------------------------------------------------------------
# ML_DETECT_ANOMALIES(metric, ts, JSON_OBJECT(…)) OVER (PARTITION BY … ORDER
# BY …) — the flagship statement of both lab walkthroughs
# (LAB3-Walkthrough.md:119-132, LAB4-Walkthrough.md:150-163).
# ---------------------------------------------------------------------------

_MDA_RE = re.compile(r"\bML_DETECT_ANOMALIES\s*\(", re.I)


def _match_paren(s: str, open_idx: int, pair: str = "()") -> int:
    """Index of the closer matching ``s[open_idx] == pair[0]`` (quote-aware)."""
    opener, closer = pair
    i, depth = open_idx + 1, 1
    while i < len(s):
        c = s[i]
        if c == "'":
            i += 1
            while i < len(s):
                if s[i] == "'":
                    if i + 1 < len(s) and s[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif c == opener:
            depth += 1
        elif c == closer:
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _split_top_level(args: str) -> list[str]:
    """Split on top-level commas (quote- and paren-aware)."""
    out, buf, depth, i, n = [], [], 0, 0, len(args)
    while i < n:
        c = args[i]
        if c == "'":
            buf.append(c)
            i += 1
            while i < n:
                buf.append(args[i])
                if args[i] == "'":
                    if i + 1 < n and args[i + 1] == "'":
                        buf.append("'")
                        i += 2
                        continue
                    break
                i += 1
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            buf.append(c)
        elif c == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    out.append("".join(buf))
    return out


# any existing frame clause — BETWEEN form or single-bound shorthand —
# is REPLACED by the operator's training-window cap (appending a second
# frame clause would be unparseable)
_FRAME_RE = re.compile(
    r"(RANGE|ROWS)\s+(BETWEEN\s+\S+(\s+\S+)?\s+AND\s+\S+(\s+\S+)?"
    r"|UNBOUNDED\s+PRECEDING|\d+\s+PRECEDING|CURRENT\s+ROW)",
    re.I,
)


def rewrite_ml_detect_anomalies(sql: str, spark: SparkSession) -> str:
    """Rewrite each ``ML_DETECT_ANOMALIES(metric, ts, JSON_OBJECT(…)) OVER
    (spec)`` onto the engine's registered window UDF
    (sql.register_ml_detect_anomalies_sql).

    Two deliberate plan changes, both semantics-preserving:

    - the frame is capped at ``maxTrainingSize PRECEDING`` (AR training
      never reads further back), so each row ships an O(maxTrainingSize)
      frame instead of its whole unbounded history;
    - the UDF's ``array<double>`` output is rebuilt into the reference's
      ``anomaly_result`` struct via a JVM-side ``transform`` lambda, so the
      window function is evaluated once per row, not once per struct field.

    The second argument (the event-time column) is carried by the OVER
    spec's ORDER BY, exactly as in Flink.
    """
    from quickstart_streaming_agents_spark.sql import register_ml_detect_anomalies_sql

    while True:
        m = _MDA_RE.search(sql)
        if not m:
            return sql
        open_idx = sql.index("(", m.end() - 1)
        close = _match_paren(sql, open_idx)
        if close < 0:
            return sql  # malformed; leave for Spark's parser to report
        args = _split_top_level(sql[open_idx + 1:close])
        metric = args[0].strip()
        params_txt = args[2] if len(args) > 2 else ""

        def _p(key: str, default: str) -> str:
            pm = re.search(rf"'{key}'\s+VALUE\s+([\w.+-]+)", params_txt, re.I)
            return pm.group(1) if pm else default

        min_n = int(float(_p("minTrainingSize", "8")))
        max_n = int(float(_p("maxTrainingSize", "50")))
        conf = float(_p("confidencePercentage", "95.0"))
        stl = _p("enableStl", "FALSE").upper() == "TRUE"

        over_m = re.match(r"\s*OVER\s*\(", sql[close + 1:], re.I)
        if not over_m:
            raise ValueError(
                "ML_DETECT_ANOMALIES requires an OVER (PARTITION BY … ORDER BY …) "
                "clause (LAB3-Walkthrough.md:128-132)"
            )
        ov_open = close + 1 + over_m.end() - 1
        ov_close = _match_paren(sql, ov_open)
        if ov_close < 0:
            return sql  # unbalanced OVER(…) — let Spark's parser report it
        spec = sql[ov_open + 1:ov_close]
        capped = f"ROWS BETWEEN {max_n} PRECEDING AND CURRENT ROW"
        spec, n_sub = _FRAME_RE.subn(capped, spec)
        if not n_sub:
            spec = spec.rstrip() + " " + capped

        fn = register_ml_detect_anomalies_sql(spark, min_n, max_n, conf, stl)
        repl = (
            f"element_at(transform(array({fn}(CAST({metric} AS DOUBLE)) "
            f"OVER ({spec})), _a -> named_struct("
            f"'forecast_value', _a[0], 'upper_bound', _a[1], "
            f"'lower_bound', _a[2], 'is_anomaly', coalesce(_a[3] > 0.5D, false))), 1)"
        )
        sql = sql[:m.start()] + repl + sql[ov_close + 1:]


def rewrite_laterals(sql: str) -> str:
    while True:
        m = _LAT_RE.search(sql)
        if not m:
            return sql
        fn = m.group(1).upper()
        # scan for the inner call's close and the outer TABLE(…)'s close;
        # depth counts from 2 (both opens consumed by the regex); string
        # literals are skipped so quoted parens can't unbalance the scan
        i, depth = m.end(), 2
        inner_close = outer_close = None
        while i < len(sql):
            c = sql[i]
            if c == "'":
                i += 1
                while i < len(sql):
                    if sql[i] == "'":
                        if i + 1 < len(sql) and sql[i + 1] == "'":
                            i += 2
                            continue
                        break
                    i += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 1 and inner_close is None:
                    inner_close = i
                elif depth == 0:
                    outer_close = i
                    break
            i += 1
        if outer_close is None:
            return sql  # malformed; leave for Spark's parser to report
        args = sql[m.end():inner_close]
        if fn == "VECTOR_SEARCH_AGG":
            vm = re.match(r"\s*(\w+)\s*,\s*DESCRIPTOR\s*\(\s*\w+\s*\)\s*,\s*(.*)$",
                          args, re.S | re.I)
            # targets the aggregate form (one row, search_results array) —
            # the reference contract the walkthrough SQL indexes into
            # (vs.search_results[1].chunk, LAB4-Walkthrough.md:280-300)
            repl = f"LATERAL vector_search_agg_{vm.group(1)}({vm.group(2)})"
        else:
            # the corpus passes the model/agent NAME as a backtick
            # identifier; the UDTF wants a string literal
            args = re.sub(r"^\s*`([^`]+)`", r"'\1'", args)
            repl = f"LATERAL {_UDTF_FOR[fn]}({args})"
        sql = sql[:m.start()] + repl + sql[outer_close + 1:]


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

@dataclass
class StatementResult:
    kind: str                      # set|connection|model|tool|agent|ctas|insert|select|drop|describe|noop
    name: str = ""
    df: DataFrame | None = None
    info: dict[str, Any] = field(default_factory=dict)


_CTAS_RE = re.compile(
    r"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(`?\w+`?)"
    r"(\s*\((?:[^()]|\([^()]*\))*\))?"      # optional (cols / PRIMARY KEY …)
    r"(\s*WITH\s*\((?:[^()]|\([^()]*\))*\))?"
    r"\s*AS\s+(.*)$",
    re.I | re.S,
)


def run_sql_script(
    spark: SparkSession,
    script: str,
    catalog: EngineCatalog | None = None,
) -> list[StatementResult]:
    """Execute a SQL script; returns one ``StatementResult`` per statement.

    DataFrames in the results are lazy — callers decide what to collect,
    like the reference's CLI printing only SELECT output.

    Scripts run under standard-SQL string-literal semantics
    (``spark.sql.parser.escapedStringLiterals=true``, restored after):
    Flink does not process C-style escapes in literals, so the corpus'
    regex literals (``'\\*{0,2}Verdict:\\s*([A-Z_]+)'``,
    LAB3-Walkthrough.md:460-463, LAB4-Walkthrough.md:404-407) must reach
    the regex engine with their backslashes intact — under Spark's default
    parsing ``'\\*'`` collapses to a dangling ``*`` quantifier and the
    statement throws.
    """
    cat = catalog if catalog is not None else DEFAULT_CATALOG
    # Two session knobs for the script's duration (restored after):
    # standard-SQL literals (above), and Arrow-batched Python-UDTF
    # transfer — Spark's UDTFs are pickled row-at-a-time by default,
    # which would put every lateral ML_PREDICT/AI_RUN_AGENT/vector
    # search on the banned row-Python path (plans/inspect.py's
    # assert_no_row_python); with the flag they plan as
    # ArrowEvalPythonUDTF, the same batched tier as pandas UDFs.
    knobs = {
        "spark.sql.parser.escapedStringLiterals": "true",
        "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    }
    prev = {k: spark.conf.get(k, "false") for k in knobs}
    for k, v in knobs.items():
        spark.conf.set(k, v)
    try:
        results: list[StatementResult] = []
        for stmt in split_statements(script):
            results.append(_run_statement(spark, stmt, cat))
        return results
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def _ddl_name(obj: str, stmt: str) -> str:
    """The (possibly backticked, possibly IF NOT EXISTS-prefixed) name of
    a CREATE <obj> statement — the reference's emitted DDL uses backticks
    (scripts/common/sql_extractors.py:255)."""
    m = re.match(
        rf"CREATE\s+{obj}\s+(?:IF\s+NOT\s+EXISTS\s+)?(`[^`]+`|[\w.-]+)",
        stmt, re.I,
    )
    if not m:
        raise ValueError(f"cannot parse CREATE {obj} name: {stmt[:80]!r}")
    return m.group(1).strip("`")


def _refresh_sql_surface(spark: SparkSession, cat: EngineCatalog) -> None:
    """Catalog DDL just changed the model/agent set; re-register the SQL
    UDFs/UDTFs so later statements in the same script see the new objects
    (their closures snapshot the catalog at registration time)."""
    from quickstart_streaming_agents_spark.sql import register_engine_sql

    register_engine_sql(spark, cat)


def _run_statement(spark: SparkSession, stmt: str, cat: EngineCatalog) -> StatementResult:
    head = stmt.split(None, 2)
    kw = head[0].upper() if head else ""
    second = head[1].upper() if len(head) > 1 else ""

    if kw == "SET":
        m = re.match(r"SET\s+'([^']+)'\s*=\s*'([^']*)'", stmt, re.I)
        k, v = (m.group(1), m.group(2)) if m else ("", "")
        return StatementResult("set", k, info={"value": v, "applied": False})

    if kw == "ALTER":
        return StatementResult("noop", info={"statement": stmt})

    if kw == "CREATE" and second == "CONNECTION":
        name = _ddl_name("CONNECTION", stmt)
        props = _with_props(stmt)
        cat.create_connection(
            name,
            type=props.get("type", "fake").lower(),
            endpoint=props.get("endpoint", ""),
            credentials=tuple(
                (k, v) for k, v in props.items() if k not in ("type", "endpoint")
            ),
        )
        return StatementResult("connection", name)

    if kw == "CREATE" and second == "MODEL":
        name = _ddl_name("MODEL", stmt)
        props = _with_props(stmt)
        out_m = re.search(r"OUTPUT\s*\(\s*(\w+)", stmt, re.I)
        task = props.get("task") or (
            "embedding" if out_m and out_m.group(1).lower() == "embedding"
            else "text_generation"
        )
        conn_name = next(
            (v for k, v in props.items() if k.endswith(".connection")), None
        )
        reserved = {"task", "provider"}
        cat.create_model(
            name,
            provider=props.get("provider", "fake"),
            task=task,
            params=tuple((k, v) for k, v in props.items() if k not in reserved),
            connection=cat.connections.get(conn_name) if conn_name else None,
        )
        _refresh_sql_surface(spark, cat)
        return StatementResult("model", name)

    if kw == "CREATE" and second == "TOOL":
        name = _ddl_name("TOOL", stmt)
        conn = re.search(r"USING\s+CONNECTION\s+(`[^`]+`|\w+)", stmt, re.I)
        props = _with_props(stmt)
        cat.create_tool(
            name,
            connection=(
                cat.connections.get(conn.group(1).strip("`")) if conn else None
            ),
            allowed_tools=tuple(
                t.strip() for t in props.get("allowed_tools", "").split(",") if t.strip()
            ),
            request_timeout=float(props.get("request_timeout", "30")),
        )
        return StatementResult("tool", name)

    if kw == "CREATE" and second == "AGENT":
        name = _ddl_name("AGENT", stmt)
        model = re.search(
            r"USING\s+MODEL\s+(`[^`]+`|\w+)", stmt, re.I
        ).group(1).strip("`")
        prompt_m = re.search(r"USING\s+PROMPT\s+'((?:[^']|'')*)'", stmt, re.I)
        # terminate at COMMENT as well as WITH — LAB1's corpus statement
        # carries a COMMENT between the tool list and the WITH clause —
        # and accept backticked tool names
        tools_m = re.search(
            r"USING\s+TOOLS\s+([`\w,\s]+?)(?:\s+COMMENT\b|\s+WITH\b|$)",
            stmt, re.I,
        )
        props = _with_props(stmt)
        tools = tuple(
            cat.tools[t.strip().strip("`")]
            for t in (tools_m.group(1).split(",") if tools_m else [])
            if t.strip().strip("`") in cat.tools
        )
        cat.create_agent(
            name,
            model,
            prompt=_unq(prompt_m.group(1)) if prompt_m else "",
            tools=tools,
            max_iterations=int(props.get("max_iterations", "10")),
            max_consecutive_failures=int(props.get("max_consecutive_failures", "2")),
        )
        _refresh_sql_surface(spark, cat)
        return StatementResult("agent", name)

    if kw == "CREATE":  # CREATE TABLE … AS SELECT
        m = _CTAS_RE.match(stmt)
        if m:
            name = m.group(1).strip("`")
            df = spark.sql(rewrite_flink(m.group(4), spark))
            df.createOrReplaceTempView(name)
            key_m = re.search(r"PRIMARY\s+KEY\s*\(\s*(\w+)", m.group(2) or "", re.I)
            return StatementResult(
                "ctas", name, df,
                info={"key": key_m.group(1) if key_m else None,
                      "props": _parse_props(m.group(3) or "")},
            )
        # plain CREATE TABLE DDL etc. — hand to Spark
        return StatementResult("select", df=spark.sql(stmt))

    if kw == "INSERT":
        m = re.match(
            r"INSERT\s+INTO\s+(`[^`]+`|\w+)\s*(\([^)]*\))?\s*(.*)$",
            stmt, re.I | re.S,
        )
        if not m:
            raise ValueError(f"cannot parse INSERT statement: {stmt[:80]!r}")
        name = m.group(1).strip("`")
        df = spark.sql(rewrite_flink(m.group(3), spark))
        if m.group(2):  # explicit column list: INSERT INTO t(a, b) …
            cols = [c.strip().strip("`") for c in m.group(2)[1:-1].split(",")]
            df = df.toDF(*cols)
        if spark.catalog.tableExists(name):
            old = spark.table(name)
            df = old.unionAll(df.toDF(*old.columns))
        df.createOrReplaceTempView(name)
        return StatementResult("insert", name, spark.table(name))

    if kw == "DROP":
        m = re.match(r"DROP\s+(\w+)\s+(?:IF\s+EXISTS\s+)?(\w+)", stmt, re.I)
        obj, name = m.group(1).lower(), m.group(2)
        if obj == "table":
            spark.catalog.dropTempView(name)
        else:
            getattr(cat, f"drop_{obj}")(name)
        return StatementResult("drop", name, info={"object": obj})

    if kw in ("DESCRIBE", "DESC"):
        name = stmt.split()[-1]
        return StatementResult("describe", name, spark.sql(f"DESCRIBE {name}"))

    return StatementResult("select", df=spark.sql(rewrite_flink(stmt, spark)))
