"""Plan inspection — the engine's scale-property assertions as a library.

`.explain()` is for humans; these helpers make physical-plan shape
machine-checkable so scale regressions (a lost broadcast, an extra
shuffle, Python falling off the Arrow path) fail tests instead of
surfacing as 100× slowdowns at deployment scale. Used by
tests/test_plans.py and available to engine users for their own
pipelines.
"""

from quickstart_streaming_agents_spark.plans.inspect import (
    assert_no_exchange,
    assert_no_row_python,
    count_exchanges,
    count_keyed_exchanges,
    count_roundrobin_exchanges,
    physical_plan,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "physical_plan",
    "count_exchanges",
    "count_keyed_exchanges",
    "count_roundrobin_exchanges",
    "assert_no_exchange",
    "assert_no_row_python",
    "pushed_filters",
    "scan_columns",
]
