"""Parquet fixture sources (the driver's TPC-H-ish star schema).

The reference's sources are Avro Kafka topics declared via ``CREATE TABLE``
DDL (terraform/lab1-tool-calling/main.tf:233-241); here the batch-mode
equivalent is a parquet scan per named table. Column pruning and predicate
pushdown reach the scan automatically because everything downstream is
declarative DataFrame ops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: these are
# bounded reference data (5 regions, 25 nations), not fact tables.
BROADCAST_TABLES = frozenset({"region", "nation"})


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to session-TZ ``timestamp``.

    The driver has shipped the ``events`` fixture with different physical
    ``ts`` types across regenerations, so branch on the *loaded* dtype
    rather than assuming a vintage:

    - ``bigint``: TIMESTAMP(NANOS) read with ``nanosAsLong`` — truncate
      ns→µs with integer division (int64 ns exceed double precision),
      matching DuckDB's ns→µs truncation so oracle comparisons agree.
    - ``timestamp_ntz``: plain ``timestamp[us]`` parquet — cast to
      session-TZ timestamp (session TZ is pinned to UTC in session.py, so
      the wall clock is unchanged and DuckDB agrees).
    - ``timestamp``: already what we want; pass through.
    """
    from pyspark.sql import functions as F

    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # nanosAsLong is harmless when the file is already µs; it only
        # affects TIMESTAMP(NANOS) columns. Set it so a nanos-vintage
        # fixture loads instead of erroring, then normalize on dtype.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_event_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
