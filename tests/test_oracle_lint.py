"""Oracle-SQL portability lint (VERDICT r8 "Next round" #1).

The r7/r8 driver hash-reds were both ORACLE-side version fragility:
``round(x, 9)`` on negative doubles and ``//`` on negative operands
each changed behavior across DuckDB releases.  These tests make that
entire class a CI failure at authoring time: every registered oracle
runs through ``guard_intdiv`` — a rewrite that turns any ``//`` / ``%``
evaluation with a negative operand into a runtime error — against the
real sf0.01 fixtures (the driver's comparison SF, where 365/500
documents have negative ``raw_margin``).
"""

from __future__ import annotations

import pytest

from quickstart_streaming_agents_spark.plans.oracle_lint import (
    guard_intdiv,
    intdiv_sites,
    mask_literals,
    round_on_derived_sites,
)
from quickstart_streaming_agents_spark.queries import ORACLE

from .oracle_util import duckdb_conn

SF_DIR = "/root/testdata/sf0.01"


def test_mask_literals_hides_strings_and_comments():
    sql = "SELECT a % 2 FROM t WHERE s LIKE '%x%' -- c % d\nAND b % 3 = 0"
    masked = mask_literals(sql)
    assert len(masked) == len(sql)
    assert "'%x%'" not in masked and "c % d" not in masked
    # real modulo operators survive masking at their original offsets
    assert [sql[i] for i in range(len(sql)) if masked[i] == "%"] == ["%", "%"]


def test_intdiv_site_extraction_handles_casts_and_chains():
    sql = "SELECT ('0x'||substr(md5(x),1,15))::UBIGINT % 4096 AS b FROM t"
    [(_, _, left, op, right)] = intdiv_sites(sql)
    assert left == "('0x'||substr(md5(x),1,15))::UBIGINT"
    assert (op, right) == ("%", "4096")

    sql = "SELECT (a + b) * 1000000000 // (1000 * n) AS q FROM t"
    [(_, _, left, op, right)] = intdiv_sites(sql)
    assert left == "(a + b) * 1000000000"  # same-precedence chain folded
    assert (op, right) == ("//", "(1000 * n)")


def test_guard_catches_the_r8_negative_division_bug():
    """The exact formula that was hash-red in CORRECTNESS_r08 must trip
    the guard on the real fixtures (negative raw_margin rows exist)."""
    old = r"""
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ts
        FROM documents
    ),
    feats AS (
        SELECT doc_id,
               ('0x'||substr(md5(unnest(ts)),1,15))::UBIGINT % 4096 AS b
        FROM tok
    ),
    scored AS (
        SELECT doc_id, count(*) AS n_features,
               sum(CAST(('0x'||substr(md5(CAST(b AS VARCHAR)),1,15))::UBIGINT
                        % 2001 AS BIGINT) - 1000) AS raw_margin
        FROM feats GROUP BY doc_id
    )
    SELECT doc_id,
           (raw_margin * 1000000000) // (1000 * n_features) AS score_e9
    FROM scored
    """
    con = duckdb_conn(SF_DIR)
    with pytest.raises(Exception, match="NEGDIV"):
        con.execute(guard_intdiv(old)).fetchall()


def test_every_registered_oracle_is_negdiv_free():
    """Run EVERY oracle through the sign guard on the driver's SF.
    A new oracle using ``//`` or ``%`` on operands that can go negative
    fails here before the external driver ever grades it."""
    con = duckdb_conn(SF_DIR)
    failures: list[str] = []
    for name, sql in sorted(ORACLE.items()):
        guarded = guard_intdiv(sql)
        try:
            con.execute(guarded).fetchall()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "NEGDIV" in msg:
                failures.append(f"{name}: {msg[:160]}")
            else:
                failures.append(f"{name} (guard rewrite broke): {msg[:160]}")
    assert not failures, "\n".join(failures)


def test_no_power_operator_in_any_oracle():
    """DuckDB's ``**`` returns DOUBLE even on HUGEINT (verified 1.0.0),
    so 'integer' power expressions silently lose exactness — caught
    live in the first draft of the hll_distinct_sketch oracle (a SUM
    of wide-spread 2^(53-r) double terms rounds). Integer powers of
    two must use ``<<``."""
    from quickstart_streaming_agents_spark.plans.oracle_lint import (
        power_operator_sites,
    )

    offenders = {
        name: hits
        for name, sql in ORACLE.items()
        if (hits := power_operator_sites(sql))
    }
    assert not offenders, offenders


def test_no_function_wrapped_unnest_in_any_oracle():
    """Ban ``f(unnest(...))`` in any SELECT expression (VERDICT r9 #1):
    the r9 classifier-pair hash-red isolated to ``md5(unnest(ts))`` —
    the ONE construct unique to the red oracles vs 15 green oracles on
    identical machinery. DuckDB's layering of scalar functions over
    ``unnest`` in the select list drifted across releases; the portable
    pattern is a bare top-level unnest in its own CTE, functions applied
    in the next CTE."""
    from quickstart_streaming_agents_spark.plans.oracle_lint import (
        wrapped_unnest_sites,
    )

    offenders = {
        name: hits
        for name, sql in ORACLE.items()
        if (hits := wrapped_unnest_sites(sql))
    }
    assert not offenders, offenders


def test_wrapped_unnest_detector_flags_the_r9_construct():
    from quickstart_streaming_agents_spark.plans.oracle_lint import (
        wrapped_unnest_sites,
    )

    bad = "SELECT doc_id, md5(unnest(ts)) AS h FROM tok"
    assert wrapped_unnest_sites(bad)
    good = "SELECT doc_id, unnest(ts) AS t FROM tok"
    assert wrapped_unnest_sites(good) == []
    subq = "SELECT * FROM h CROSS JOIN (SELECT unnest(range(64)) AS j) j"
    assert wrapped_unnest_sites(subq) == []
    from_clause = "SELECT i FROM tok, unnest(range(1, len(ts))) AS t(i)"
    assert wrapped_unnest_sites(from_clause) == []


def test_classifier_oracles_have_no_round_on_derived_doubles():
    """The two formerly-red queries must stay free of the OTHER fragile
    construct too — round() over a float derivation (the r7 red)."""
    for name in ("quality_classifier_score", "quality_classifier_digest"):
        assert round_on_derived_sites(ORACLE[name]) == [], name


def test_no_exotic_integer_types_in_any_oracle_result():
    """Bind (not execute) every oracle in DuckDB and ban HUGEINT /
    UHUGEINT / UBIGINT / DECIMAL output columns (round 11): DuckDB's
    ``sum(BIGINT)`` silently widens to HUGEINT — a type Spark never
    emits, whose driver-side canonicalization (Arrow decimal128 /
    float64, engine-version-dependent) is the one result-layer
    difference left between the 4-rounds-red classifier pair (negative
    HUGEINT aggregates) and the hash-green family (all BIGINT).
    Portable pattern: ``CAST(sum(...) AS BIGINT)`` at every aggregate
    that reaches the result schema."""
    con = duckdb_conn(SF_DIR)
    banned = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
              "USMALLINT", "UTINYINT", "DECIMAL")
    offenders = {}
    for name, sql in ORACLE.items():
        rel = con.sql(sql)  # lazy: binds + types, no execution
        hits = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, [str(t) for t in rel.types])
            if str(t).startswith(banned)
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, offenders
