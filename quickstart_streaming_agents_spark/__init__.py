"""quickstart_streaming_agents_spark — a PySpark-native streaming-analytics engine.

A brand-new engine with the query and data-processing capabilities of
``confluentinc/quickstart-streaming-agents`` (a workshop driving Confluent
Cloud Flink SQL), re-expressed Spark-first:

- Stream catalog over Kafka/file sources (CTAS ≡ writeStream + re-register).
- Event-time tumbling windows + watermarks (reference: TUMBLE TVF,
  LAB3-Walkthrough.md:99-112).
- Stream joins incl. interval joins (LAB4-Walkthrough.md:231-235).
- ``ml_detect_anomalies`` — online per-key AR forecast + confidence bounds
  (reference ML_DETECT_ANOMALIES OVER window, LAB3-Walkthrough.md:119-132).
- ``ml_predict`` / ``vector_search`` / ``ai_tool_invoke`` / ``ai_run_agent``
  row-level AI functions backed by a model/tool/agent registry with a
  deterministic fake provider for tests (reference CREATE MODEL/TOOL/AGENT).
- Beyond-reference LLM-data-pipeline operators: dedup (exact/MinHash/SimHash/
  n-gram/embedding), similarity search, text analysis, multimodal plumbing.

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning and
join strategy; Python appears only in Arrow-batched pandas UDFs.
"""

from quickstart_streaming_agents_spark.functions.agents import (
    ai_run_agent,
    ai_tool_invoke,
)
from quickstart_streaming_agents_spark.functions.ml import ml_predict
from quickstart_streaming_agents_spark.functions.vector import (
    vector_search,
    vector_search_flat,
)
from quickstart_streaming_agents_spark.operators.anomaly import ml_detect_anomalies
from quickstart_streaming_agents_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from quickstart_streaming_agents_spark.operators.similarity import (
    ann_ivf,
    ann_lsh,
    knn_bruteforce,
)
from quickstart_streaming_agents_spark.operators.windows import tumble
from quickstart_streaming_agents_spark.registries import (
    DEFAULT_CATALOG,
    EngineCatalog,
)
from quickstart_streaming_agents_spark.script import run_sql_script
from quickstart_streaming_agents_spark.session import get_spark, ship_package

__all__ = [
    "get_spark",
    "ship_package",
    "EngineCatalog",
    "DEFAULT_CATALOG",
    "tumble",
    "ml_detect_anomalies",
    "ml_predict",
    "vector_search",
    "vector_search_flat",
    "ai_run_agent",
    "ai_tool_invoke",
    "run_sql_script",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_near_dup_pairs",
    "ann_lsh",
    "ann_ivf",
    "knn_bruteforce",
]
__version__ = "0.1.0"
