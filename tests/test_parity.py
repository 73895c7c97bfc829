"""Every registered oracle query must match DuckDB at sf0.001.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import pytest

from quickstart_streaming_agents_spark.queries import ORACLE, QUERIES
from tests.conftest import SF_DIR
from tests.oracle_util import assert_query_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, name):
    assert_query_matches_oracle(spark, SF_DIR, QUERIES[name], ORACLE[name])


def test_all_queries_run_and_nonempty(spark):
    """Every query must return rows at the smallest SF — a 0-row result
    would "match" its oracle while verifying nothing."""
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() > 0, f"{name} verifies nothing at sf0.001"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
