"""Web-curation operator tests (operators/web.py): href extraction,
RFC 9309 longest-match verdicts, and the robots.txt body parser."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from quickstart_streaming_agents_spark.operators.web import (
    extract_links,
    parse_robots_txt,
    robots_rules_table,
    robots_verdicts,
)


def test_extract_links_hosts_paths_and_relative_filter(spark):
    html = (
        '<a href="https://News.Example.com/A/B?q=1">x</a> '
        "<a href='http://other.org'>y</a> "
        '<a href="/relative/only">z</a> '
        '<a href="mailto:a@b.c">m</a>'
    )
    df = spark.createDataFrame([Row(doc_id=1, html=html)])
    got = sorted(
        (r.url, r.host, r.path) for r in extract_links(df).collect()
    )
    assert got == [
        ("http://other.org", "other.org", "/"),
        ("https://News.Example.com/A/B?q=1", "news.example.com", "/A/B"),
    ]
    rel = extract_links(df, absolute_only=False).collect()
    assert {r.url for r in rel} >= {"/relative/only", "mailto:a@b.c"}


def test_robots_verdicts_semantics(spark):
    """Longest prefix wins; equal length -> allow wins; no matching
    rule or unknown host -> default allow."""
    urls = spark.createDataFrame([
        Row(url="u1", host="a.com", path="/private/x"),
        Row(url="u2", host="a.com", path="/private/pub/x"),
        Row(url="u3", host="a.com", path="/open/x"),
        Row(url="u4", host="nohost.com", path="/anything"),
        Row(url="u5", host="a.com", path="/tie"),
    ])
    rules = spark.createDataFrame([
        Row(host="a.com", prefix="/private", allow=False),
        Row(host="a.com", prefix="/private/pub", allow=True),
        Row(host="a.com", prefix="/tie", allow=False),
        Row(host="a.com", prefix="/tie", allow=True),  # tie -> allow
    ])
    got = {r.url: (r.allowed, r.matched_prefix)
           for r in robots_verdicts(urls, rules).collect()}
    assert got == {
        "u1": (False, "/private"),
        "u2": (True, "/private/pub"),
        "u3": (True, None),
        "u4": (True, None),
        "u5": (True, "/tie"),
    }


def test_parse_robots_txt_groups_and_agent_precedence():
    body = """
# comment
User-agent: BigBot
Disallow: /bigbot-only

User-agent: *
User-agent: legacy
Disallow: /private
Allow: /private/pub
Disallow:
Crawl-delay: 10

User-agent: *
Disallow: /second-star-group
"""
    star = parse_robots_txt(body, agent="*")
    assert {(r["prefix"], r["allow"]) for r in star} == {
        ("/private", False), ("/private/pub", True),
        ("/second-star-group", False),
    }
    big = parse_robots_txt(body, agent="bigbot")
    assert big == [{"prefix": "/bigbot-only", "allow": False}]
    # exact group wins: star rules must NOT leak into BigBot's set
    assert all(r["prefix"] != "/private" for r in big)
    assert parse_robots_txt("", agent="*") == []
    assert parse_robots_txt("Disallow: /orphan", agent="*") == []


def test_robots_rules_table_spark_surface(spark):
    df = spark.createDataFrame([
        Row(host="a.com", robots_txt="User-agent: *\nDisallow: /x"),
        Row(host="b.com", robots_txt=None),
    ])
    got = [(r.host, r.prefix, r.allow)
           for r in robots_rules_table(df).collect()]
    assert got == [("a.com", "/x", False)]


def test_end_to_end_links_through_robots_gate(spark):
    """extract_links -> robots_verdicts composition: the crawl-frontier
    filter a curation pipeline actually runs."""
    pages = spark.createDataFrame([
        Row(doc_id=1, html='<a href="http://a.com/private/z">l</a>'
                           '<a href="http://a.com/ok">m</a>'),
    ])
    rules = spark.createDataFrame(
        [Row(host="a.com", prefix="/private", allow=False)]
    )
    links = extract_links(pages, html_col="html")
    got = {r.url: r.allowed
           for r in robots_verdicts(links, rules).collect()}
    assert got == {"http://a.com/private/z": False,
                   "http://a.com/ok": True}


def test_extract_anchors_pairs_hrefs_with_text(spark):
    html = (
        '<a class="x" href="https://A.com/1">First Link</a>'
        "<a href='http://b.org' rel=nofollow> spaced text </a>"
        '<a href="/rel">skipped</a>'
        '<a href="https://c.net/2"></a>'  # empty anchor text kept
    )
    df = spark.createDataFrame([Row(doc_id=7, html=html)])
    from quickstart_streaming_agents_spark.operators.web import (
        extract_anchors,
    )

    got = sorted((r.host, r.anchor_text)
                 for r in extract_anchors(df).collect())
    assert got == [
        ("a.com", "First Link"),
        ("b.org", "spaced text"),
        ("c.net", ""),
    ]
