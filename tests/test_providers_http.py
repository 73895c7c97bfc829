"""Loopback-HTTP provider tests: the real urllib client paths end-to-end.

The reference's test philosophy is "assert output, not RUNNING state, or you
miss silent failures" (testing/e2e/test_lab1.py:262-288 in /root/reference).
These tests stand up an in-process ``http.server`` speaking the
chat-completions, embeddings, and Bedrock invoke-model JSON shapes and drive
``providers.py``'s openai/azureopenai/bedrock clients — plus the agent
loop's real-model branch — through actual HTTP, including error handling
(non-200, timeout).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from quickstart_streaming_agents_spark.providers import (
    bedrock_embedding,
    bedrock_textgen,
    openai_compatible_embedding,
    openai_compatible_textgen,
    resolve_provider,
)
from quickstart_streaming_agents_spark.registries import Connection, Model


class _StubHandler(BaseHTTPRequestHandler):
    """Routes: /chat/completions, /embeddings, /model/<id>/invoke (textgen
    via anthropic "messages" body, embedding via "inputText"), /agent
    (stateful: TOOL_CALL first, then a verdict), /error500, /slow."""

    server_version = "StubLLM/1"

    def log_message(self, *a):  # keep pytest output clean
        pass

    def _reply(self, code: int, obj: dict):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self):  # noqa: N802 — http.server API
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        log = self.server.request_log
        log.append({"path": self.path, "headers": dict(self.headers), "body": body})
        if self.path == "/error500":
            return self._reply(500, {"error": {"message": "backend exploded"}})
        if self.path == "/slow":
            time.sleep(2.0)
            return self._reply(200, {"choices": [{"message": {"content": "late"}}]})
        if self.path == "/chat/completions":
            prompt = body["messages"][-1]["content"]
            return self._reply(
                200, {"choices": [{"message": {"content": f"ECHO:{prompt}"}}]}
            )
        if self.path == "/embeddings":
            texts = body["input"]
            return self._reply(
                200,
                {"data": [
                    {"index": i, "embedding": [float(len(t)), float(i)]}
                    for i, t in enumerate(texts)
                ]},
            )
        if self.path.startswith("/model/") and self.path.endswith("/invoke"):
            if "inputText" in body:  # Titan-embeddings shape
                return self._reply(
                    200, {"embedding": [float(len(body["inputText"])), 7.0]}
                )
            prompt = body["messages"][0]["content"][0]["text"]
            return self._reply(
                200,
                {"content": [
                    {"type": "text", "text": "BEDROCK:"},
                    {"type": "text", "text": prompt[:32]},
                ]},
            )
        if self.path == "/agent":
            prompt = body["messages"][-1]["content"]
            n = sum(1 for r in log if r["path"] == "/agent")
            if "TOOL_RESULT[http_get]" not in prompt and n == 1:
                step = "TOOL_CALL " + json.dumps(
                    {"tool": "http_get", "args": {"url": "https://example.com/x"}}
                )
            else:
                step = "**Verdict:** MATCH\nReasoning: stub agent done."
            return self._reply(200, {"choices": [{"message": {"content": step}}]})
        return self._reply(404, {"error": "no route"})


@pytest.fixture(scope="module")
def stub_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    srv.request_log = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _base(srv) -> str:
    return f"http://127.0.0.1:{srv.server_address[1]}"


def _model(srv, path, *, provider, task="text_generation", conn_type=None,
           params=(), api_key="sk-test-123"):
    conn = Connection(
        name="loop", type=conn_type or provider, endpoint=_base(srv) + path,
        credentials=(("api_key", api_key),),
    )
    return Model(name="m", provider=provider, task=task, params=tuple(params),
                 connection=conn)


def test_openai_textgen_roundtrip(stub_server):
    stub_server.request_log.clear()
    model = _model(stub_server, "/chat/completions", provider="openai",
                   params=[("max_tokens", "64"), ("model_name", "test-model")])
    out = openai_compatible_textgen(["hello world", "second"], model)
    assert out == ["ECHO:hello world", "ECHO:second"]
    reqs = stub_server.request_log
    assert len(reqs) == 2
    # bearer-token branch + params surfaced in the request body
    assert reqs[0]["headers"]["Authorization"] == "Bearer sk-test-123"
    assert reqs[0]["body"]["max_tokens"] == 64
    assert reqs[0]["body"]["model"] == "test-model"


def test_azureopenai_header_branch(stub_server):
    stub_server.request_log.clear()
    model = _model(stub_server, "/chat/completions", provider="azureopenai",
                   conn_type="azureopenai")
    out = resolve_provider(model)(["azure prompt"], model)
    assert out == ["ECHO:azure prompt"]
    hdrs = stub_server.request_log[0]["headers"]
    assert hdrs["Api-Key"] == "sk-test-123" or hdrs.get("api-key") == "sk-test-123"
    assert "Authorization" not in hdrs


def test_openai_embedding_roundtrip(stub_server):
    stub_server.request_log.clear()
    model = _model(stub_server, "/embeddings", provider="openai", task="embedding",
                   params=[("model_name", "embed-small")])
    out = openai_compatible_embedding(["abc", "defgh"], model)
    assert out == [[3.0, 0.0], [5.0, 1.0]]
    body = stub_server.request_log[0]["body"]
    assert body["input"] == ["abc", "defgh"]
    assert body["model"] == "embed-small"


def test_bedrock_textgen_invoke_shape(stub_server):
    stub_server.request_log.clear()
    model = _model(stub_server, "", provider="bedrock",
                   params=[("model_name", "test.claude-shape")])
    out = bedrock_textgen(["price check"], model)
    assert out == ["BEDROCK:price check"]
    req = stub_server.request_log[0]
    assert req["path"] == "/model/test.claude-shape/invoke"
    assert req["body"]["anthropic_version"] == "bedrock-2023-05-31"
    assert req["headers"]["Authorization"] == "Bearer sk-test-123"


def test_bedrock_embedding_invoke_shape(stub_server):
    stub_server.request_log.clear()
    model = _model(stub_server, "", provider="bedrock", task="embedding",
                   params=[("model_name", "test.titan-shape")], api_key="")
    out = bedrock_embedding(["four", "sixsix"], model)
    assert out == [[4.0, 7.0], [6.0, 7.0]]
    reqs = stub_server.request_log
    assert [r["body"]["inputText"] for r in reqs] == ["four", "sixsix"]
    assert "Authorization" not in reqs[0]["headers"]  # no api_key → no header


def test_non_200_raises_with_status_and_detail(stub_server):
    model = _model(stub_server, "/error500", provider="openai")
    with pytest.raises(RuntimeError, match="HTTP 500.*backend exploded"):
        openai_compatible_textgen(["boom"], model)


def test_timeout_propagates(stub_server):
    model = _model(stub_server, "/slow", provider="openai",
                   params=[("timeout", "0.3")])
    with pytest.raises(Exception) as exc_info:
        openai_compatible_textgen(["too slow"], model)
    assert "timed out" in str(exc_info.value).lower()


def test_missing_endpoint_fails_fast():
    model = Model(name="m", provider="openai", connection=None)
    with pytest.raises(RuntimeError, match="no connection/endpoint"):
        openai_compatible_textgen(["x"], model)


def test_agent_loop_real_model_branch(stub_server):
    """run_agent_once through the provider path: the stub emits a TOOL_CALL,
    the loop executes the tool and re-prompts with TOOL_RESULT, the stub then
    emits a verdict → SUCCESS."""
    from quickstart_streaming_agents_spark.functions.agents import run_agent_once
    from quickstart_streaming_agents_spark.registries import Agent, Tool

    stub_server.request_log.clear()
    model = _model(stub_server, "/agent", provider="openai")
    agent = Agent(
        name="pricer", model=model, prompt="You check prices.",
        tools=(Tool(name="web", allowed_tools=("http_get",)),),
        max_iterations=5,
    )
    status, response = run_agent_once(agent, "is this price competitive?")
    assert status == "SUCCESS"
    assert "**Verdict:** MATCH" in response
    agent_reqs = [r for r in stub_server.request_log if r["path"] == "/agent"]
    assert len(agent_reqs) == 2
    # second model call must carry the executed tool's result in-transcript
    assert "TOOL_RESULT[http_get]" in agent_reqs[1]["body"]["messages"][-1]["content"]


def test_ml_predict_through_http_provider(stub_server, spark):
    """End-to-end: Spark pandas-UDF workers call the loopback endpoint."""
    from quickstart_streaming_agents_spark.functions.ml import ml_predict

    model = _model(stub_server, "/chat/completions", provider="openai")
    df = spark.createDataFrame([("p1",), ("p2",), ("p3",)], "prompt string")
    rows = df.withColumn("response", ml_predict(model, "prompt")).collect()
    assert sorted(r["response"] for r in rows) == ["ECHO:p1", "ECHO:p2", "ECHO:p3"]


def test_agent_real_model_receives_tool_contract(stub_server):
    """A real model can only call tools if the transcript TELLS it the
    TOOL_CALL wire format and the whitelist — assert the instruction
    header and tool names reach the provider."""
    from quickstart_streaming_agents_spark.functions.agents import run_agent_once
    from quickstart_streaming_agents_spark.registries import Agent, Tool

    stub_server.request_log.clear()
    model = _model(stub_server, "/agent", provider="openai")
    agent = Agent(
        name="pricer", model=model, prompt="You check prices.",
        tools=(Tool(name="web", allowed_tools=("http_get",)),),
        max_iterations=5,
    )
    run_agent_once(agent, "check this")
    first = [r for r in stub_server.request_log if r["path"] == "/agent"][0]
    sent = first["body"]["messages"][-1]["content"]
    assert 'TOOL_CALL {"tool"' in sent
    assert "Available tools: http_get" in sent
