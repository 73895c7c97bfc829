"""Oracle-SQL portability lint — catch version-fragile arithmetic at
authoring time.

Two rounds of driver hash-reds (r7 ``round(x, 9)`` on negative doubles,
r8 ``//`` on negative operands) traced to the same root cause: oracle
SQL using constructs whose result differs across DuckDB versions even
though every individual engine is self-consistent.  The fragile
constructs are:

* ``//`` / ``%`` **on negative operands** — DuckDB switched between
  truncating and flooring semantics across releases, so
  ``-7 // 2`` is ``-3`` on some driver hosts and ``-4`` on others.
  On non-negative operands every engine and every version agrees.
* ``round(x, n)`` **on derived doubles** (quotients, averages) — the
  round-half direction on doubles drifted across DuckDB releases; on
  sums of fixed-decimal inputs the argument sits exactly on the grid
  and rounding is a no-op, which is why ``round(sum(value), 2)`` pins
  are safe but ``round(a / b, 9)`` is advisory-risk.

This module provides a **runtime** check for the first class (static
sign analysis is impossible — ``raw_margin``'s negativity comes from
the data) and a **textual advisory** for the second:

``guard_intdiv(sql)`` rewrites every ``A // B`` / ``A % B`` site so a
negative operand raises ``error('NEGDIV...')`` when the oracle runs,
and ``tests/test_oracle_lint.py`` executes every registered oracle
through the guard against the real fixtures — a new oracle with
``//``-on-negatives fails CI before the driver ever sees it.
"""

from __future__ import annotations

import re

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*$")


def mask_literals(sql: str) -> str:
    """Replace string literals and ``--`` comments with spaces (same
    length, so positions line up with the original text)."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # escaped ''
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        elif c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            j = n if j == -1 else j
            for k in range(i, j):
                out[k] = " "
            i = j
        else:
            i += 1
    return "".join(out)


def _scan_primary_left(masked: str, end: int) -> int:
    """Start index of the primary expression ending at ``end``
    (exclusive) — walks back over parenthesized groups, function
    calls, identifiers, numbers, ``::TYPE`` casts and ``.`` access."""
    i = end
    while i > 0 and masked[i - 1].isspace():
        i -= 1
    start = i
    while i > 0:
        c = masked[i - 1]
        if c == ")":
            depth = 0
            while i > 0:
                i -= 1
                if masked[i] == ")":
                    depth += 1
                elif masked[i] == "(":
                    depth -= 1
                    if depth == 0:
                        break
            # function name directly before the paren
            j = i
            while j > 0 and (masked[j - 1].isalnum() or masked[j - 1] == "_"):
                j -= 1
            i = j
        elif c.isalnum() or c == "_":
            j = i
            while j > 0 and (masked[j - 1].isalnum() or masked[j - 1] == "_"):
                j -= 1
            i = j
        else:
            break
        start = i
        # extend through '::' casts and '.' qualified names
        if i >= 2 and masked[i - 2 : i] == "::":
            i -= 2
            continue
        if i >= 1 and masked[i - 1] == ".":
            i -= 1
            continue
        break
    return start


def _scan_primary_right(masked: str, start: int) -> int:
    """End index (exclusive) of the primary expression starting at
    ``start`` — mirrors ``_scan_primary_left``."""
    n = len(masked)
    i = start
    while i < n and masked[i].isspace():
        i += 1
    while i < n:
        c = masked[i]
        if c == "(":
            depth = 0
            while i < n:
                if masked[i] == "(":
                    depth += 1
                elif masked[i] == ")":
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                i += 1
        elif c.isalnum() or c == "_":
            while i < n and (masked[i].isalnum() or masked[i] == "_"):
                i += 1
            if i < n and masked[i] == "(":  # function call
                continue
        else:
            break
        if i + 1 < n and masked[i : i + 2] == "::":
            i += 2
            continue
        if i < n and masked[i] == ".":
            i += 1
            continue
        break
    return i


def intdiv_sites(sql: str) -> list[tuple[int, int, str, str, str]]:
    """Find every top-level ``//`` / ``%`` site. Returns
    ``(start, end, left_expr, op, right_expr)`` spans over the ORIGINAL
    text, where the span covers ``left op right`` with same-precedence
    left-assoc chains folded into the left operand (``a * b // c``
    yields left ``a * b``)."""
    masked = mask_literals(sql)
    sites: list[tuple[int, int, str, str, str]] = []
    i, n = 0, len(masked)
    while i < n:
        if masked.startswith("//", i):
            op, op_len = "//", 2
        elif masked[i] == "%":
            op, op_len = "%", 1
        else:
            i += 1
            continue
        left_start = _scan_primary_left(masked, i)
        # fold left-assoc same-precedence chain: a * b // c → left = a*b
        while True:
            j = left_start
            while j > 0 and masked[j - 1].isspace():
                j -= 1
            if j >= 2 and masked[j - 2 : j] == "//":
                prev_len = 2
            elif j >= 1 and masked[j - 1] in "*%":
                prev_len = 1
            else:
                break
            left_start = _scan_primary_left(masked, j - prev_len)
        right_end = _scan_primary_right(masked, i + op_len)
        sites.append(
            (
                left_start,
                right_end,
                sql[left_start:i].strip(),
                op,
                sql[i + op_len : right_end].strip(),
            )
        )
        i += op_len
    return sites


def guard_intdiv(sql: str) -> str:
    """Rewrite every ``A // B`` / ``A % B`` so negative operands raise
    ``error('NEGDIV ...')`` at runtime — run the result in DuckDB over
    the real fixtures to prove the oracle can never hit the
    truncate-vs-floor version divergence."""
    # keep only outermost sites (a nested `//` inside another site's
    # operand is guarded recursively when the fragment is built)
    sites = sorted(intdiv_sites(sql), key=lambda s: (s[0], -s[1]))
    outer: list[tuple[int, int, str, str, str]] = []
    for s in sites:
        if outer and s[0] < outer[-1][1]:
            continue
        outer.append(s)
    out = sql
    for start, end, left, op, right in reversed(outer):
        gl, gr = guard_intdiv(left), guard_intdiv(right)
        msg = f"{left} {op} {right}".replace("'", "''")[:120]
        frag = (
            f"(CASE WHEN ({gl}) < 0 OR ({gr}) < 0 "
            f"THEN error('NEGDIV: {msg}') "
            f"ELSE ({gl}) {op} ({gr}) END)"
        )
        out = out[:start] + frag + out[end:]
    return out


def power_operator_sites(sql: str) -> list[str]:
    """Flag ``**`` (and infix ``^``) in oracle SQL: DuckDB's power
    operator returns DOUBLE even on HUGEINT operands (verified on
    1.0.0), so an 'integer' 2**k silently becomes a float and a SUM of
    wide-spread power terms rounds — caught live in the r9
    hll_distinct_sketch oracle (fixed to an integer ``<<``)."""
    masked = mask_literals(sql)
    hits = []
    for m in re.finditer(r"\*\*|(?<![<>=!|])\^", masked):
        lo = max(0, m.start() - 30)
        hits.append(sql[lo : m.end() + 30].replace("\n", " ").strip())
    return hits


_UNNEST_RE = re.compile(r"\bunnest\s*\(", re.IGNORECASE)
# Enclosing-paren predecessors that are NOT scalar function calls:
# keywords introducing subqueries / boolean groups / set operands.
_NOT_A_FUNCTION = {
    "in", "exists", "any", "all", "some", "values", "using", "as", "on",
    "and", "or", "not", "when", "then", "else", "where", "by", "from",
    "join", "over", "lateral", "union", "intersect", "except",
}


def wrapped_unnest_sites(sql: str) -> list[str]:
    """Flag ``unnest(...)`` nested inside a scalar function's argument
    list (``md5(unnest(ts))``). DuckDB's handling of expressions layered
    on top of ``unnest`` in the SELECT list has drifted across releases
    — the r9 driver hash-red on the classifier pair isolated to exactly
    this construct (VERDICT r9 "What's wrong" #1), while every green
    oracle unnests bare (top-level in its own CTE / FROM clause) and
    applies functions to the unnested column in the next CTE. Subquery
    parens (``(SELECT unnest(...) ...)``) are fine and skipped."""
    masked = mask_literals(sql)
    hits: list[str] = []
    for m in _UNNEST_RE.finditer(masked):
        stack: list[int] = []
        for i in range(m.start()):
            if masked[i] == "(":
                stack.append(i)
            elif masked[i] == ")" and stack:
                stack.pop()
        for p in stack:
            after = masked[p + 1 : p + 40].lstrip()
            if re.match(r"select\b", after, re.IGNORECASE):
                continue  # subquery, not a function call
            j = p
            while j > 0 and masked[j - 1].isspace():
                j -= 1
            k = j
            while k > 0 and (masked[k - 1].isalnum() or masked[k - 1] == "_"):
                k -= 1
            name = masked[k:j].lower()
            if name and name not in _NOT_A_FUNCTION:
                lo = max(0, k - 10)
                hits.append(
                    sql[lo : m.end() + 40].replace("\n", " ").strip()
                )
                break
    return hits


_ROUND_RE = re.compile(r"\bround\s*\(", re.IGNORECASE)
_DERIVED = re.compile(r"/(?!/)|\bavg\s*\(|\bstddev|\bquantile|\bsqrt\s*\(")


def round_on_derived_sites(sql: str) -> list[str]:
    """Advisory: ``round(...)`` whose argument contains a float-valued
    derivation (division, avg, stddev, quantile, sqrt). These are
    1-ULP-sensitive across engine versions; prefer integerizing (the
    shifted-fixed-point pattern) where the driver hash matters."""
    masked = mask_literals(sql)
    hits: list[str] = []
    for m in _ROUND_RE.finditer(masked):
        i, depth = m.end() - 1, 0
        while i < len(masked):
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        arg = masked[m.end() : i]
        if _DERIVED.search(arg):
            hits.append(sql[m.start() : i + 1].strip())
    return hits
