"""``ml_predict`` — row-level model inference as a lateral function.

Reference: ``LATERAL TABLE(ML_PREDICT('model', input[, MAP opts]))`` —
1 row in → 1 row out (LAB1-Walkthrough.md:70, terraform/lab2-vector-search/
main.tf:253,331). In Spark this is not a join at all: an Arrow-batched
pandas UDF appended with ``withColumn``. The iterator form initializes the
provider client once per worker python process and streams record batches
through it — at 100 TB the model endpoint is the bottleneck, not Spark, so
the knobs that matter are batch size (``spark.sql.execution.arrow.
maxRecordsPerBatch``) and endpoint-side concurrency = number of tasks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quickstart_streaming_agents_spark.providers import resolve_provider
from quickstart_streaming_agents_spark.registries import Model


def ml_predict(model: Model, input_col: str | Column) -> Column:
    """Column expression: model inference over ``input_col``.

    ``task="text_generation"`` → StringType ``response``;
    ``task="embedding"`` → ArrayType(FloatType) ``embedding``.
    Use as ``df.withColumn("response", ml_predict(model, "prompt"))``.
    """
    resolve_provider(model)  # fail fast on the driver (raises for any
    # task outside the provider registry)
    col = F.col(input_col) if isinstance(input_col, str) else input_col
    ret_type = (
        T.ArrayType(T.FloatType())
        if model.task == "embedding"
        else T.StringType()
    )

    @F.pandas_udf(ret_type)
    def _infer(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        fn = resolve_provider(model)
        for s in batches:
            yield pd.Series(fn(s.fillna("").tolist(), model), index=s.index)

    return _infer(col)
