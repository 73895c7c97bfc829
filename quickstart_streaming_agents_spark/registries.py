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


DEFAULT_CATALOG = EngineCatalog()
DEFAULT_CATALOG.create_model("fake_textgen", provider="fake", task="text_generation")
DEFAULT_CATALOG.create_model("fake_embedding", provider="fake", task="embedding")
