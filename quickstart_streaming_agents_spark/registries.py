"""Connection / Model / Tool / Agent registries.

The reference declares these as Flink DDL catalog objects:
``CREATE CONNECTION`` (terraform/lab1-tool-calling/main.tf:66-72),
``CREATE MODEL … INPUT(…) OUTPUT(…)`` (terraform/core/main.tf:461-563),
``CREATE TOOL … WITH ('allowed_tools'…, 'request_timeout'…)``
(LAB1-Walkthrough.md:141-148), and ``CREATE AGENT … USING MODEL/PROMPT/
TOOLS WITH ('max_iterations'…, 'max_consecutive_failures'…)``
(LAB1-Walkthrough.md:155-181).

Here they are plain frozen dataclasses: picklable, so a pandas-UDF closure
can carry the exact config to executors without a driver-side lookup —
the registry itself never crosses the wire.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Connection:
    name: str
    type: str  # "mcp_server" | "mongodb" | "cosmosdb" | "bedrock" | "azureopenai" | "fake"
    endpoint: str = ""
    credentials: tuple[tuple[str, str], ...] = ()  # tuple-of-pairs: hashable/picklable


@dataclass(frozen=True)
class Model:
    """A registered inference endpoint with typed I/O.

    task: "text_generation" (STRING → response STRING) or "embedding"
    (STRING → embedding ARRAY<FLOAT>), matching the reference's two CREATE
    MODEL shapes (terraform/core/main.tf:461,529).
    """

    name: str
    provider: str = "fake"  # "fake" | "bedrock" | "azureopenai" | "openai"
    task: str = "text_generation"
    params: tuple[tuple[str, str], ...] = ()
    connection: Connection | None = None
    embedding_dim: int = 64  # fixture embeddings are 64-dim; reference uses 1536

    def param(self, key: str, default: str | None = None) -> str | None:
        return dict(self.params).get(key, default)


@dataclass(frozen=True)
class Tool:
    """Whitelisted tool set with a timeout (reference CREATE TOOL)."""

    name: str
    connection: Connection | None = None
    allowed_tools: tuple[str, ...] = ()
    request_timeout: float = 30.0


@dataclass(frozen=True)
class Agent:
    """Model + system prompt + tools + loop bounds (reference CREATE AGENT)."""

    name: str
    model: Model
    prompt: str = ""
    tools: tuple[Tool, ...] = ()
    max_iterations: int = 10
    max_consecutive_failures: int = 2


@dataclass
class EngineCatalog:
    """Named registries, the engine-level analog of the Flink catalog."""

    connections: dict[str, Connection] = field(default_factory=dict)
    models: dict[str, Model] = field(default_factory=dict)
    tools: dict[str, Tool] = field(default_factory=dict)
    agents: dict[str, Agent] = field(default_factory=dict)

    def create_connection(self, name: str, **kw) -> Connection:
        c = Connection(name=name, **kw)
        self.connections[name] = c
        return c

    def create_model(self, name: str, **kw) -> Model:
        m = Model(name=name, **kw)
        self.models[name] = m
        return m

    def create_tool(self, name: str, **kw) -> Tool:
        t = Tool(name=name, **kw)
        self.tools[name] = t
        return t

    def create_agent(self, name: str, model: str | Model, **kw) -> Agent:
        if isinstance(model, str):
            model = self.models[model]
        a = Agent(name=name, model=model, **kw)
        self.agents[name] = a
        return a

    # S12 — DROP <object> / DESCRIBE (testing/helpers/flink_sql_helper.py:
    # 276-281,361 in /root/reference use these for idempotent re-runs)

    def drop_connection(self, name: str) -> None:
        self.connections.pop(name, None)

    def drop_model(self, name: str) -> None:
        self.models.pop(name, None)

    def drop_tool(self, name: str) -> None:
        self.tools.pop(name, None)

    def drop_agent(self, name: str) -> None:
        self.agents.pop(name, None)

    def describe(self) -> dict[str, list[str]]:
        return {
            "connections": sorted(self.connections),
            "models": sorted(self.models),
            "tools": sorted(self.tools),
            "agents": sorted(self.agents),
        }

    # -- persistence --------------------------------------------------------
    # The reference's catalog objects persist in Terraform state / the
    # Confluent catalog; the local analog is one JSON file. Nested objects
    # are stored by name (connections under models/tools, model/tools under
    # agents), so editing a connection and re-loading re-links everything.
    # The file carries endpoints and credential pairs verbatim — treat it
    # with the same care as a credentials.env.

    def save(self, path: str) -> None:
        import json

        # close the reference graph: agents may hold Model/Tool instances
        # (and models/tools a Connection) that were never registered by
        # name — serializing them by name alone would make load() KeyError
        # or silently drop the connection
        models = dict(self.models)
        tools = dict(self.tools)
        connections = dict(self.connections)
        for a in self.agents.values():
            models.setdefault(a.model.name, a.model)
            for t in a.tools:
                tools.setdefault(t.name, t)
        for m in models.values():
            if m.connection is not None:
                connections.setdefault(m.connection.name, m.connection)
        for t in tools.values():
            if t.connection is not None:
                connections.setdefault(t.connection.name, t.connection)

        doc = {
            "connections": [
                {"name": c.name, "type": c.type, "endpoint": c.endpoint,
                 "credentials": [list(p) for p in c.credentials]}
                for c in connections.values()
            ],
            "models": [
                {"name": m.name, "provider": m.provider, "task": m.task,
                 "params": [list(p) for p in m.params],
                 "connection": m.connection.name if m.connection else None,
                 "embedding_dim": m.embedding_dim}
                for m in models.values()
            ],
            "tools": [
                {"name": t.name,
                 "connection": t.connection.name if t.connection else None,
                 "allowed_tools": list(t.allowed_tools),
                 "request_timeout": t.request_timeout}
                for t in tools.values()
            ],
            "agents": [
                {"name": a.name, "model": a.model.name, "prompt": a.prompt,
                 "tools": [t.name for t in a.tools],
                 "max_iterations": a.max_iterations,
                 "max_consecutive_failures": a.max_consecutive_failures}
                for a in self.agents.values()
            ],
        }
        with open(path, "w") as f:
            json.dump(doc, f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "EngineCatalog":
        import json

        with open(path) as f:
            doc = json.load(f)
        cat = cls()
        for c in doc.get("connections", []):
            cat.create_connection(
                c["name"], type=c["type"], endpoint=c.get("endpoint", ""),
                credentials=tuple(tuple(p) for p in c.get("credentials", [])),
            )
        for m in doc.get("models", []):
            cat.create_model(
                m["name"], provider=m["provider"], task=m["task"],
                params=tuple(tuple(p) for p in m.get("params", [])),
                connection=cat.connections.get(m.get("connection")),
                embedding_dim=m.get("embedding_dim", 64),
            )
        for t in doc.get("tools", []):
            cat.create_tool(
                t["name"], connection=cat.connections.get(t.get("connection")),
                allowed_tools=tuple(t.get("allowed_tools", [])),
                request_timeout=t.get("request_timeout", 30.0),
            )
        for a in doc.get("agents", []):
            cat.create_agent(
                a["name"], model=a["model"], prompt=a.get("prompt", ""),
                tools=tuple(cat.tools[n] for n in a.get("tools", [])),
                max_iterations=a.get("max_iterations", 10),
                max_consecutive_failures=a.get("max_consecutive_failures", 2),
            )
        return cat


DEFAULT_CATALOG = EngineCatalog()
DEFAULT_CATALOG.create_model("fake_textgen", provider="fake", task="text_generation")
DEFAULT_CATALOG.create_model("fake_embedding", provider="fake", task="embedding")
