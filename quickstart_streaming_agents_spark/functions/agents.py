"""``ai_tool_invoke`` / ``ai_run_agent`` — tool-calling and agent loops.

Reference:
- ``AI_TOOL_INVOKE(model, prompt, MAP remote_udfs, MAP mcp_tools, MAP opts)``
  — single-shot tool call through the model (LAB1-Walkthrough.md:80-92).
- ``LATERAL TABLE(AI_RUN_AGENT(agent, prompt)) AS (status, response)`` —
  bounded multi-turn loop (≤ max_iterations, ≤ max_consecutive_failures)
  with MCP tools; raw free text parsed downstream by REGEXP_EXTRACT
  (LAB1-Walkthrough.md:207-255, LAB3:466-471, LAB4:418-445; bounds
  LAB1:178-180, LAB3:446-447).

Execution model: one Arrow-batched pandas UDF per column; each row runs its
own bounded loop worker-side. Agent invocations have side effects (emails,
dispatch posts), so pipelines feeding agents must use append-mode streams —
the reference forces ``changelog.mode=append`` for exactly this reason
(LAB3-Walkthrough.md:226,456). The fake MCP toolset is deterministic so
integration tests are exact.

Tool-call wire format (model ↔ loop): a single line
``TOOL_CALL {"tool": name, "args": {...}}`` — anything else is a final
answer. The fake agent model emits one tool call per allowed tool, then a
final labeled answer, exercising ≥2 loop iterations.
"""

from __future__ import annotations

import hashlib
import json
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quickstart_streaming_agents_spark.registries import Agent, Model, Tool

AGENT_RESULT_TYPE = T.StructType(
    [
        T.StructField("status", T.StringType()),
        T.StructField("response", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# fake MCP tool executors (deterministic stand-ins for the reference's
# http_get / send_email / http_post MCP tools, LAB1-Walkthrough.md:141-148)
# ---------------------------------------------------------------------------

def _tool_http_get(args: dict) -> str:
    url = str(args.get("url", ""))
    h = int(hashlib.md5(url.encode()).hexdigest()[:8], 16)
    return f"HTTP 200 from {url}: competitor_price=${(h % 30000) / 100:.2f}"


def _tool_send_email(args: dict) -> str:
    return f"EMAIL_SENT to={args.get('to', '?')} subject={args.get('subject', '')[:40]!r}"


def _tool_http_post(args: dict) -> str:
    body = json.dumps(args.get("body", {}), sort_keys=True)
    return f"POSTED {args.get('url', '')} ack={hashlib.md5(body.encode()).hexdigest()[:12]}"


def _tool_always_fails(args: dict) -> str:
    raise RuntimeError("tool permanently unavailable")


TOOL_EXECUTORS = {
    "http_get": _tool_http_get,
    "send_email": _tool_send_email,
    "http_post": _tool_http_post,
    "always_fails": _tool_always_fails,
}


# ---------------------------------------------------------------------------
# fake agent-capable model step
# ---------------------------------------------------------------------------

def _fake_agent_step(transcript: str, allowed: list[str]) -> str:
    """Deterministic policy: call each allowed tool until it has succeeded
    (retrying failures, like a real agent), then emit a final labeled answer
    matching any requested verdict format."""
    for tool_name in allowed:
        if f"TOOL_RESULT[{tool_name}]" not in transcript:
            args = {"url": f"https://example.com/{tool_name}", "to": "user@example.com",
                    "subject": "automated", "body": {"q": transcript[:32]}}
            return "TOOL_CALL " + json.dumps({"tool": tool_name, "args": args})
    from quickstart_streaming_agents_spark.providers import (
        compose_labeled_sections,
        pick_verdict_choice,
    )

    sections = compose_labeled_sections(transcript)
    if sections is not None:
        return sections
    pick = pick_verdict_choice(transcript)
    if pick is not None:
        return f"**Verdict:** {pick}\nReasoning: fake agent completed after tool use."
    return "AGENT_DONE: " + transcript[-80:]


def run_agent_once(agent: Agent, user_prompt: str) -> tuple[str, str]:
    """One bounded agent loop for one input row → (status, response)."""
    allowed = [t for tool in agent.tools for t in tool.allowed_tools]
    transcript = f"{agent.prompt}\n\nUSER: {user_prompt}"
    if agent.model.provider != "fake" and allowed:
        # a real model must be TOLD the tool wire format and the whitelist
        # or it can never call a tool (the fake policy knows it natively)
        transcript = (
            "You may call tools. To call one, reply with EXACTLY one line:\n"
            'TOOL_CALL {"tool": "<name>", "args": {...}}\n'
            f"Available tools: {', '.join(allowed)}. Tool results come back "
            "as TOOL_RESULT[<name>] lines; when finished, reply with your "
            "final answer instead of a TOOL_CALL.\n\n"
        ) + transcript
    consecutive_failures = 0
    last = ""
    for _ in range(max(1, agent.max_iterations)):
        if agent.model.provider == "fake":
            step = _fake_agent_step(transcript, allowed)
        else:  # real model: same wire format via the provider's textgen
            from quickstart_streaming_agents_spark.providers import resolve_provider

            step = resolve_provider(agent.model)([transcript], agent.model)[0]
        last = step
        if step.startswith("TOOL_CALL "):
            name = "?"  # a parse failure must not blame the previous tool
            try:
                call = json.loads(step[len("TOOL_CALL "):])
                name = call.get("tool", "")
                if name not in allowed:
                    raise PermissionError(f"tool {name!r} not in allowed_tools")
                result = TOOL_EXECUTORS[name](call.get("args", {}))
                transcript += f"\nTOOL_RESULT[{name}]: {result}"
                consecutive_failures = 0
            except Exception as exc:  # noqa: BLE001 — any tool error counts
                transcript += f"\nTOOL_FAIL[{name}]: {exc}"
                consecutive_failures += 1
                if consecutive_failures >= agent.max_consecutive_failures:
                    return "FAILURE", f"aborted after {consecutive_failures} consecutive tool failures: {exc}"
            continue
        return "SUCCESS", step
    return "FAILURE", f"max_iterations={agent.max_iterations} exhausted; last: {last[:200]}"


# ---------------------------------------------------------------------------
# column functions
# ---------------------------------------------------------------------------

def ai_run_agent(agent: Agent, prompt_col: str | Column) -> Column:
    """struct<status, response> per row — the AI_RUN_AGENT lateral shape."""
    col = F.col(prompt_col) if isinstance(prompt_col, str) else prompt_col

    @F.pandas_udf(AGENT_RESULT_TYPE)
    def _run(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in batches:
            rows = [run_agent_once(agent, p or "") for p in s.tolist()]
            yield pd.DataFrame(rows, columns=["status", "response"], index=s.index)

    return _run(col)


def invoke_tool_once(
    tool_name: str, prompt: str, extra_args: dict | None = None
) -> tuple[str, str, str]:
    """(tool_name, result, response) for one single-shot invocation — the
    ONE implementation behind both the DataFrame and the SQL
    AI_TOOL_INVOKE surfaces."""
    try:
        if tool_name not in TOOL_EXECUTORS:
            raise KeyError(f"unknown tool {tool_name!r}")
        args = {"url": f"https://example.com/?q={(prompt or '')[:24]}"}
        args.update(extra_args or {})
        result = TOOL_EXECUTORS[tool_name](args)
        return (tool_name, result, f"tool {tool_name} ok")
    except Exception as exc:  # noqa: BLE001 — any tool error counts
        return (tool_name, "", f"tool {tool_name} failed: {exc}")


def ai_tool_invoke(model: Model, prompt_col: str | Column, tools: tuple[Tool, ...]) -> Column:
    """Single-shot tool invocation: struct<tool_name, result, response>.

    Mirrors AI_TOOL_INVOKE's map-of-results shape (LAB1-Walkthrough.md:80-92)
    with a one-tool whitelist per call.
    """
    allowed = [t for tool in tools for t in tool.allowed_tools]
    out_type = T.StructType(
        [
            T.StructField("tool_name", T.StringType()),
            T.StructField("result", T.StringType()),
            T.StructField("response", T.StringType()),
        ]
    )
    col = F.col(prompt_col) if isinstance(prompt_col, str) else prompt_col

    @F.pandas_udf(out_type)
    def _invoke(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for s in batches:
            rows = [
                invoke_tool_once(allowed[0] if allowed else "", p)
                for p in s.tolist()
            ]
            yield pd.DataFrame(rows, columns=["tool_name", "result", "response"], index=s.index)

    return _invoke(col)
