"""Sitemap ingestion contract (operators/sitemap.py +
crawl_sitemap_urls / crawl_sitemap_frontier).

The sidecar is composition truth (tools/gen_sitemap_fixture.py —
re-asserted against BOTH twins at generation time); here the Spark
expressions are pinned to it and differentially to the Python twin;
parity pins the oracle read of the same sidecar."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_map_reduce_spark.operators.sitemap import (
    parse_sitemap_entries,
    parse_sitemap_py,
    resolve_sitemap_index,
)

SIDE = "/root/repo/refdata/sitemap_expected.parquet"
INPUTS = "/root/repo/refdata/sitemap_fixture.parquet"


def test_fixture_spark_matches_sidecar(spark):
    """Spark parse + index resolution == the composed sidecar on ALL
    rows (fields, via_index, and the epoch every lastmod string was
    composed from)."""
    from parallel_map_reduce_spark.sources.catalog import read_parquet

    got = resolve_sitemap_index(
        parse_sitemap_entries(read_parquet(spark, INPUTS))
    ).select(
        "host", "sitemap_url", "via_index", "loc", "lastmod",
        F.unix_micros("lastmod_ts").alias("epoch"),
        "changefreq", "priority",
    )
    exp = read_parquet(spark, SIDE).select(
        "host",
        F.col("sitemap_url").alias("e_sitemap_url"),
        F.col("via_index").alias("e_via_index"),
        "loc",
        F.col("lastmod").alias("e_lastmod"),
        F.col("lastmod_epoch_us").alias("e_epoch"),
        F.col("changefreq").alias("e_changefreq"),
        F.col("priority").alias("e_priority"),
    )
    j = got.join(exp, ["host", "loc"], "full")
    bad = j.filter(
        ~F.col("sitemap_url").eqNullSafe(F.col("e_sitemap_url"))
        | ~F.col("via_index").eqNullSafe(F.col("e_via_index"))
        | ~F.col("lastmod").eqNullSafe(F.col("e_lastmod"))
        | ~F.col("epoch").eqNullSafe(F.col("e_epoch"))
        | ~F.col("changefreq").eqNullSafe(F.col("e_changefreq"))
        | ~F.col("priority").eqNullSafe(F.col("e_priority"))
    ).limit(5).collect()
    assert not bad, bad
    assert got.count() == 2720


def test_spark_matches_twin_differential(spark):
    """Spark parse == the Python twin record-for-record over every
    committed sitemap file."""
    import pyarrow.parquet as pq

    from parallel_map_reduce_spark.sources.catalog import read_parquet

    files = pq.read_table(INPUTS).to_pylist()
    twin = {}
    for f in files:
        for rec in parse_sitemap_py(f["xml"]):
            twin[(f["sitemap_url"], rec["kind"], rec["loc"])] = (
                rec["lastmod"], rec["changefreq"], rec["priority"],
            )
    got = parse_sitemap_entries(read_parquet(spark, INPUTS)).collect()
    assert len(got) == len(twin)
    for r in got:
        assert twin[(r.sitemap_url, r.kind, r.loc)] == (
            r.lastmod, r.changefreq, r.priority,
        ), r


@pytest.mark.parametrize(
    "xml,exp",
    [
        # entity unescape order: &amp;lt; is the LITERAL string &lt;
        ("<urlset><url><loc>/a?x=&amp;lt;&amp;y=2</loc></url></urlset>",
         [("url", "/a?x=&lt;&y=2")]),
        # whitespace + attributes + compact index
        ('<sitemapindex x="1"><sitemap><loc>\n  /sm.xml\n</loc>'
         "</sitemap></sitemapindex>",
         [("sitemap", "/sm.xml")]),
        # record without loc is dropped
        ("<urlset><url><lastmod>2024-01-01</lastmod></url>"
         "<url><loc>/b</loc></url></urlset>",
         [("url", "/b")]),
    ],
)
def test_twin_contract_cases(xml, exp):
    got = [(r["kind"], r["loc"]) for r in parse_sitemap_py(xml)]
    assert got == exp


def test_frontier_verdicts_match_sidecar(spark, sf_dir):
    """The end-to-end discovery entry == the composed verdicts."""
    from parallel_map_reduce_spark.queries.warc_ingest import (
        crawl_sitemap_frontier,
    )
    from parallel_map_reduce_spark.sources.catalog import read_parquet

    got = crawl_sitemap_frontier(spark, sf_dir)
    exp = read_parquet(spark, SIDE).select(
        "host", "loc",
        F.col("exp_allowed").alias("e_allowed"),
        F.col("exp_rule").alias("e_rule"),
    )
    j = got.join(exp, ["host", "loc"])
    assert j.count() == got.count() > 0
    bad = j.filter(
        (F.col("allowed") != F.col("e_allowed"))
        | ~F.col("matched_rule").eqNullSafe(F.col("e_rule"))
    ).limit(5).collect()
    assert not bad, bad


def test_fixture_regenerates_identically():
    import pyarrow.parquet as pq

    import tools.gen_sitemap_fixture as G

    committed = {
        (r["host"], r["sitemap_url"]): r["xml"]
        for r in pq.read_table(INPUTS).to_pylist()
    }
    for t, kb in ((0, 0), (1, 3), (7, 12), (19, 33), (6, 5)):
        inputs, _ = G.build(t, kb)
        for host, url, xml in inputs:
            assert committed[(host, url)] == xml, (host, url)
