"""RFC 9309 robots.txt exclusion contract (operators/robots.py +
crawl_robots_filter).

Triangulation: the fixture's expectations are COMPOSED (construction
knowledge, asserted against the Python twin at generation time); here
the Spark expression is pinned to the fixture and differentially to
the twin; parity pins the DuckDB re-derivation (dynamic RE2) — three
independent matching mechanisms."""

from __future__ import annotations

import itertools
import re

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_spark.operators.robots import (
    _match_py,
    parse_robots_rules,
    robots_allowed_py,
    robots_pattern_match,
    robots_verdicts,
)

AGENT = "sparkbot"


def test_fixture_spark_matches_exp(spark):
    """Spark verdict == composed expectation on ALL 2000 rows."""
    from parallel_map_reduce_spark.queries.warc_ingest import (
        ROBOTS_FIXTURE_PARQUET,
    )
    from parallel_map_reduce_spark.sources.catalog import read_parquet

    fx = read_parquet(spark, ROBOTS_FIXTURE_PARQUET)
    rules = parse_robots_rules(
        fx.select("host", "robots_txt").distinct(), AGENT
    )
    got = robots_verdicts(
        fx.select("doc_id", "host", "path"), rules
    )
    bad = (
        got.join(fx.select("doc_id", "exp_allowed", "exp_rule",
                           "exp_rule_len"), "doc_id")
        .filter(
            (F.col("allowed") != F.col("exp_allowed"))
            | ~(
                F.col("matched_rule").eqNullSafe(F.col("exp_rule"))
            )
            | ~(
                F.col("rule_len").eqNullSafe(F.col("exp_rule_len"))
            )
        )
        .limit(5)
        .collect()
    )
    assert not bad, [
        (r.doc_id, r.path, r.allowed, r.matched_rule, r.exp_allowed,
         r.exp_rule)
        for r in bad
    ]


def test_matcher_differential_spark_twin_regex(spark):
    """The three matching mechanisms agree on an adversarial
    pattern×path product: Spark aggregate-fold == Python twin ==
    a wildcard-to-regex reference."""

    def ref(path: str, pattern: str) -> bool:
        ea = pattern.endswith("$")
        core = pattern[:-1] if ea else pattern
        rx = "".join(
            ".*" if c == "*" else re.escape(c) for c in core
        )
        return re.match("^" + rx + ("$" if ea else ""), path) is not None

    pats = ["/", "/a", "/*", "/**", "/a*", "/a**b", "/*.pdf$", "/a$",
            "/$", "/a$b", "/a*b*c$", "/a*a$", "/aa*a$", "/abc*bc$",
            "/*?sid=", "/*/old/", "*", "*$", "/ab*ab*ab$", "/p*$",
            "/ab*ab$", "/a*aa$"]
    paths = ["/", "/a", "/a/", "/ab", "/abc", "/a.pdf", "/a.pdfx",
             "/a$b", "/a$", "/aaa", "/aa", "/abcbc", "/abcbcx",
             "/q?sid=9", "/m/old/x", "/old/x", "/ababab", "/abab",
             "/p", "", "/abababX"]
    rows = [
        (i, p, q)
        for i, (p, q) in enumerate(itertools.product(paths, pats))
    ]
    for _, p, q in rows:
        assert _match_py(p, q) == ref(p, q), (p, q)
    df = spark.createDataFrame(rows, "id long, path string, pat string")
    got = {
        r.id: r.m
        for r in df.select(
            "id",
            robots_pattern_match(F.col("path"), F.col("pat")).alias("m"),
        ).collect()
    }
    bad = [
        (p, q, got[i], _match_py(p, q))
        for i, p, q in rows
        if got[i] != _match_py(p, q)
    ]
    assert not bad, bad[:5]


@pytest.mark.parametrize(
    "body,path,exp",
    [
        # allow wins the equal-length tie
        ("User-agent: *\nAllow: /d/\nDisallow: /d/", "/d/x",
         (True, "/d/", 3)),
        # longest match wins regardless of rule order
        ("User-agent: *\nAllow: /p/q/\nDisallow: /p/", "/p/q/r",
         (True, "/p/q/", 5)),
        # named group suppresses *, even when empty
        ("User-agent: *\nDisallow: /\nUser-agent: sparkbot", "/x",
         (True, None, None)),
        # groupless leading rules never apply
        ("Disallow: /x\nUser-agent: *\nDisallow: /y", "/x1",
         (True, None, None)),
        # unknown directive does not interrupt a user-agent run
        ("User-agent: a\nCrawl-delay: 1\nUser-agent: *\nDisallow: /z",
         "/z9", (False, "/z", 2)),
        # $ without wildcard = exact match only
        ("User-agent: *\nDisallow: /e$", "/e/f", (True, None, None)),
        ("User-agent: *\nDisallow: /e$", "/e", (False, "/e$", 3)),
        # empty Disallow matches nothing
        ("User-agent: *\nDisallow:", "/", (True, None, None)),
        # case-insensitive agent token, case-sensitive path
        ("User-Agent: SPARKBOT\nDisallow: /A/", "/a/", (True, None, None)),
        ("User-Agent: SPARKBOT\nDisallow: /A/", "/A/", (False, "/A/", 3)),
    ],
)
def test_twin_spec_cases(body, path, exp):
    assert robots_allowed_py(body, AGENT, path) == exp


def test_folded_equals_fanout(spark):
    """The folded serving shape (per-host rule array + in-row
    array_max) == the fan-out+aggregate shape on every fixture row —
    the two winner mechanisms are differential twins."""
    from parallel_map_reduce_spark.operators.robots import (
        robots_rules_by_host,
        robots_verdicts_folded,
    )
    from parallel_map_reduce_spark.queries.warc_ingest import (
        ROBOTS_FIXTURE_PARQUET,
    )
    from parallel_map_reduce_spark.sources.catalog import read_parquet

    fx = read_parquet(spark, ROBOTS_FIXTURE_PARQUET)
    rules = parse_robots_rules(
        fx.select("host", "robots_txt").distinct(), AGENT
    )
    urls = fx.select("doc_id", "host", "path")
    fanout = robots_verdicts(urls, rules)
    folded = robots_verdicts_folded(urls, robots_rules_by_host(rules))
    a = {r.doc_id: (r.allowed, r.matched_rule, r.rule_len)
         for r in fanout.collect()}
    b = {r.doc_id: (r.allowed, r.matched_rule, r.rule_len)
         for r in folded.collect()}
    assert a == b


def test_streaming_drain_equals_batch(spark, sf_dir):
    """The availableNow drain of the live politeness filter returns
    exactly the batch entry's verdict set."""
    from parallel_map_reduce_spark.queries.streaming_live import (
        streaming_robots_filter,
    )
    from parallel_map_reduce_spark.queries.warc_ingest import (
        crawl_robots_filter,
    )

    key = lambda r: (r.doc_id, r.host, r.path, r.allowed,
                     r.matched_rule, r.rule_len)
    live = sorted(map(key, streaming_robots_filter(spark, sf_dir).collect()))
    batch = sorted(map(key, crawl_robots_filter(spark, sf_dir).collect()))
    assert live == batch and len(live) > 0


def test_fixture_regenerates_identically():
    import pyarrow.parquet as pq

    import tools.gen_robots_fixture as G

    committed = pq.read_table(
        "/root/repo/refdata/robots_fixture.parquet"
    )
    ids = committed.column("doc_id").to_pylist()
    hosts = committed.column("host").to_pylist()
    paths = committed.column("path").to_pylist()
    allowed = committed.column("exp_allowed").to_pylist()
    assert len(ids) == G.N_DOCS
    for d in (0, 1, 35, 777, 1999):
        host, _, path, exp_allowed, _ = G.doc(d)
        i = ids.index(d)
        assert (hosts[i], paths[i], allowed[i]) == (
            host, path, exp_allowed
        )
