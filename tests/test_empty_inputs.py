"""Every registered query must survive schema-correct EMPTY inputs.

At cluster scale, empty inputs are routine: a filter that matches
nothing, a new partition, a cold-start topic. An operator that throws on
zero rows (np.stack([]), .first()[0], argpartition on an empty axis)
fails the whole job. This sweep runs all 56 queries against a fixture
directory of empty tables and requires a well-formed (usually empty)
result, not an exception.
"""

from __future__ import annotations

import pytest

from quickstart_streaming_agents_spark.queries import QUERIES
from quickstart_streaming_agents_spark.sources.parquet import TABLES

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    from quickstart_streaming_agents_spark.session import ship_package

    ship_package(spark)
    out = QUERIES[name](spark, empty_sf_dir)
    n = out.count()
    assert n >= 0  # no exception, well-formed result
