"""Web-corpus curation operators: link extraction and the robots.txt
crawl gate.

Beyond-reference surface: a crawl-derived 100 TB corpus needs (a) the
outlink graph — ``extract_links`` turns HTML anchors into
(doc, url, host) edges that feed the existing host-graph PageRank and
URL-dedup tiers — and (b) crawl-permission enforcement —
``robots_verdicts`` applies the REP longest-match rule (RFC 9309 §2.2.2:
the most specific — longest — matching path rule wins; on a
length tie, allow wins) to a URL set against a parsed rules table.

Spark-first shapes:
- ``extract_links``: pure JVM ``regexp_extract_all`` + explode — the
  href scan fuses into the document scan, one 1→N map, zero shuffle.
  The pattern is RE2-compatible (the ``BPE_PIECE_RE`` contract) so a
  DuckDB oracle replays it verbatim.
- ``robots_verdicts``: ONE host-keyed equi-join (rules ship per host —
  broadcast when the rules table is small, shuffle-hash when it is
  web-scale) + a per-URL argmax window over the few matching rules.
  No theta join: prefix matching happens AFTER the host equi-join, so
  the join fan-out is |rules per host|, never |rules|.
- ``parse_robots_txt``: the plain-Python robots.txt body parser
  (User-agent grouping, Allow/Disallow lines, '*' agent) used by the
  ingest tier to BUILD the rules table; per-row ``mapInPandas`` via
  ``robots_rules_table``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: href scanner: double- or single-quoted anchor targets. RE2-safe
#: (no lookarounds) so the SQL oracle uses the IDENTICAL pattern.
HREF_RE = r"""href=["']([^"'<>\s]+)["']"""

#: host[/path] splitter for absolute http(s) URLs.
_URL_PARTS_RE = r"^https?://([^/?#]+)([^?#]*)"


def extract_links(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    absolute_only: bool = True,
) -> DataFrame:
    """One row per anchor href: ``(id_col, url, host, path)``.

    ``host`` is lowercased (DNS is case-insensitive); ``path`` keeps
    case and defaults to ``/`` for bare-host links. With
    ``absolute_only`` (the crawl-graph default) relative hrefs are
    dropped — they need a base-URL join the caller owns.
    """
    urls = F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), F.lit(1))
    out = df.select(F.col(id_col), F.explode(urls).alias("url"))
    if absolute_only:
        out = out.filter(F.col("url").rlike("^https?://"))
    host = F.lower(F.regexp_extract("url", _URL_PARTS_RE, 1))
    path = F.regexp_extract("url", _URL_PARTS_RE, 2)
    return out.select(
        id_col,
        "url",
        host.alias("host"),
        F.when(path == "", F.lit("/")).otherwise(path).alias("path"),
    )


#: anchor scanner with TEXT capture: group 1 = href, group 2 = anchor
#: text (element content up to the closing tag). RE2-safe — no
#: backreferences or lookarounds — so the SQL oracle replays it.
ANCHOR_RE = r"""<a [^>]*href=["']([^"'<>\s]+)["'][^>]*>([^<]*)</a>"""


def extract_anchors(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """One row per anchor WITH its text: ``(id_col, url, host,
    anchor_text)`` for absolute http(s) links — the web-search signal
    layer (anchor text describes the TARGET page better than the page
    itself; aggregating it per target host/page builds the classic
    anchor index).

    Spark-first: ``regexp_extract_all`` once per capture group on the
    same pattern, ``arrays_zip`` to pair them positionally, one
    explode — all JVM, map-only, zero shuffle.
    """
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), F.lit(1))
    texts = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), F.lit(2))
    out = df.select(
        F.col(id_col),
        F.explode(F.arrays_zip(hrefs.alias("url"), texts.alias("txt")))
        .alias("a"),
    ).select(id_col, F.col("a.url").alias("url"), F.col("a.txt").alias("anchor_text"))
    out = out.filter(F.col("url").rlike("^https?://"))
    host = F.lower(F.regexp_extract("url", _URL_PARTS_RE, 1))
    return out.select(
        id_col, "url", host.alias("host"),
        F.trim(F.col("anchor_text")).alias("anchor_text"),
    )


def robots_verdicts(
    urls: DataFrame,
    rules: DataFrame,
    url_host: str = "host",
    url_path: str = "path",
) -> DataFrame:
    """RFC 9309 longest-match verdict per URL row.

    ``rules`` columns: ``host``, ``prefix`` (path prefix; '' or '/'
    matches everything), ``allow`` (boolean). Verdict: among rules of
    the URL's host whose prefix is a string prefix of the path, the
    LONGEST wins; a length tie goes to allow; a host with no matching
    rule (or absent from the table) is allowed (REP default-allow).

    Set semantics on the input: byte-identical ``urls`` rows collapse
    to ONE verdict row (the argmax partitions on the full row — a
    frontier is a set of URLs, and the streaming twin's groupBy
    collapses identically, which is what keeps the parity bit-exact).
    Callers needing per-occurrence rows carry their own ordinal column.

    Returns the ``urls`` frame + ``allowed`` boolean +
    ``matched_prefix`` (NULL when default-allowed).
    """
    r = rules.select(
        F.col("host").alias("__rhost"),
        F.col("prefix").alias("__prefix"),
        F.col("allow").alias("__allow"),
    )
    j = urls.join(
        r, urls[url_host] == F.col("__rhost"), "left"
    ).withColumn(
        "__match",
        F.col("__prefix").isNotNull()
        & F.col(url_path).startswith(F.col("__prefix")),
    )
    # longest matching prefix first; allow beats disallow on ties;
    # prefix string as the final tiebreak keeps the pick total-ordered
    w = Window.partitionBy(*urls.columns).orderBy(
        F.col("__match").desc(),
        F.length("__prefix").desc(),
        F.col("__allow").desc(),
        F.col("__prefix").asc(),
    )
    ranked = j.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return ranked.select(
        *urls.columns,
        F.when(F.col("__match"), F.col("__allow"))
        .otherwise(F.lit(True)).alias("allowed"),
        F.when(F.col("__match"), F.col("__prefix"))
        .otherwise(F.lit(None).cast("string")).alias("matched_prefix"),
    )


def parse_robots_txt(text: str, agent: str = "*") -> list[dict]:
    """Parse a robots.txt body into rule rows for ``agent``:
    ``[{prefix, allow}, ...]``.

    Implements the REP grouping rules: consecutive ``User-agent`` lines
    open a group; ``Allow``/``Disallow`` lines attach to the open
    group(s); the most specific matching agent group applies (exact
    agent name beats ``*``; we match case-insensitively on the token).
    Empty ``Disallow:`` (the allow-everything idiom) contributes no
    rule. Comments (#) and unknown directives are skipped — parsers
    must be liberal (RFC 9309 §2.2)."""
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if agents is None or groups and groups[-1][1]:
                agents = []
                groups.append((agents, []))
            elif groups:
                agents = groups[-1][0]
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if agents is None:
                continue  # rule before any user-agent line: ignore
            if val == "" and key == "disallow":
                continue  # empty Disallow == allow all == no rule
            if val:
                groups[-1][1].append((val, key == "allow"))
            # after a rule line, a following User-agent starts a NEW
            # group (handled above via groups[-1][1] non-empty)
    a = agent.lower()
    exact = [rules for agents_, rules in groups if a in agents_]
    star = [rules for agents_, rules in groups if "*" in agents_]
    chosen = exact if exact else star
    return [
        {"prefix": p, "allow": al}
        for rules in chosen
        for p, al in rules
    ]


def robots_rules_table(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """1→N map: robots.txt bodies → (host, prefix, allow) rule rows
    (un-parseable bodies yield no rows — default-allow downstream)."""
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, prefixes, allows = [], [], []
            for h, body in zip(pdf[host_col], pdf[body_col]):
                try:
                    for rule in parse_robots_txt(body or "", agent):
                        hosts.append(h)
                        prefixes.append(rule["prefix"])
                        allows.append(rule["allow"])
                except Exception:
                    continue
            yield pd.DataFrame(
                {"host": hosts, "prefix": prefixes, "allow": allows}
            )

    return df.select(host_col, body_col).mapInPandas(
        parse, schema="host string, prefix string, allow boolean"
    )
