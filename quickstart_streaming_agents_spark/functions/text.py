"""Text-analysis functions for training-data pipelines (beyond-reference).

All pure built-in column expressions — whole-stage codegen, no Python, and
each one ANSI-SQL-expressible for oracle checking. At 100 TB these run as
map-only stages fused into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
ES_MARKERS = ("el", "la", "de", "que", "los", "una", "por")
DE_MARKERS = ("der", "die", "und", "das", "ist", "nicht")


def tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def token_count(text_col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col))


# GPT-2-style pre-tokenizer pieces: contraction suffixes, space-prefixed
# letter runs, digit runs, punctuation runs. Deliberately RE2-compatible
# (no lookarounds) so the same pattern runs in the DuckDB oracle.
BPE_PIECE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def subword_token_count(text_col: str | Column) -> Column:
    """BPE-ish token-count estimate: counts pre-tokenizer pieces (the unit
    BPE merges operate within), a much tighter LLM-token proxy than
    whitespace words on punctuation- or number-heavy text. Pure JVM
    regexp_extract_all — map-only at any scale."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PIECE_RE), F.lit(0)))


def punct_ratio(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", "")) / F.greatest(
        F.length(c), F.lit(1)
    )


def _marker_count(text_col: str | Column, markers: tuple[str, ...]) -> Column:
    lst = ", ".join(f"'{m}'" for m in markers)
    t = text_col if isinstance(text_col, str) else None
    expr_src = f"size(filter(split(trim(lower({t})), '\\\\s+'), x -> x IN ({lst})))"
    return F.expr(expr_src)


def stopword_ratio(text_col: str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return _marker_count(text_col, stopwords) / F.greatest(
        token_count(text_col), F.lit(1)
    )


def lang_id(text_col: str) -> Column:
    """Marker-stopword language heuristic (n-gram LMs left to round 2).

    Picks the language whose marker list hits most tokens; 'und'
    (undetermined) when nothing matches.
    """
    en = _marker_count(text_col, EN_STOPWORDS)
    es = _marker_count(text_col, ES_MARKERS)
    de = _marker_count(text_col, DE_MARKERS)
    return (
        F.when((en >= es) & (en >= de) & (en > 0), "en")
        .when((es >= de) & (es > 0), "es")
        .when(de > 0, "de")
        .otherwise("und")
    )


def quality_score(text_col: str) -> Column:
    """Composite [0,1] quality: length saturation + low punctuation +
    stopword presence (Gopher-rules-style heuristics, public recipe)."""
    length_term = F.least(token_count(text_col) / F.lit(100.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text_col) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text_col) * 4, F.lit(1.0))
    return F.round(0.4 * length_term + 0.3 * punct_term + 0.3 * stop_term, 4)


def doc_fingerprint(text_col: str | Column) -> Column:
    """Stable content fingerprint: md5 of whitespace-normalized lowercase."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))
