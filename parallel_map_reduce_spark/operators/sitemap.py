"""Sitemap ingestion (sitemaps.org XML protocol) — the discovery
half of the crawl chain's front door: robots.txt names the host's
sitemaps; the sitemaps enumerate the URLs a polite crawler seeds its
frontier with.

From-spec implementation of the sitemap protocol's XML subset:

* **urlset files**: ``<url>`` records carrying ``<loc>`` (required),
  optional ``<lastmod>`` (W3C datetime: date-only or full datetime
  with timezone), ``<changefreq>`` and ``<priority>``.
* **sitemapindex files**: ``<sitemap>`` records whose ``<loc>``
  names a CHILD sitemap; resolution is one self-join on the child's
  URL — nesting is a single level by spec intent (indexes may not
  list other indexes).
* **Entity unescape** in text values: the five XML predefined
  entities (``&amp; &lt; &gt; &quot; &apos;``), ``&amp;`` replaced
  LAST so ``&amp;lt;`` correctly yields the literal ``&lt;``.
* Whitespace/newlines anywhere between tags; attributes (xmlns,
  schemaLocation) on any element are ignored.

DOCUMENTED CONTRACT BOUNDARY (the codec-fence policy, prose not
silence): CDATA sections, XML comments inside records, numeric
character references, and gzip-compressed sitemaps are OUT of the
contract — the committed fixture never emits them and a real
deployment would route such files through a full XML parser. The
regex record-split is sound on the contract's domain because the
protocol's elements carry no nested same-name tags.

Spark side is pure codegen — ``regexp_extract_all`` splits records,
``regexp_extract`` pulls fields, a replace chain unescapes, and
``try_to_timestamp`` parses the two W3C datetime shapes. No Python
at runtime, no shuffle in the parse itself; sitemapindex resolution
is one host-keyed join.

The Python twin mirrors the contract for the fixture generator's
composition asserts and differential tests.

Reference parity note: the reference engine (src/tema1.cpp) has no
crawl operators — this is LLM-pipeline surface, not §2.1 parity.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_BLOCK_RE = r"(?s)<url(?:\s[^>]*)?>(.*?)</url>"
_SITEMAP_BLOCK_RE = r"(?s)<sitemap(?:\s[^>]*)?>(.*?)</sitemap>"
_LOC_RE = r"(?s)<loc(?:\s[^>]*)?>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod(?:\s[^>]*)?>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ_RE = r"(?s)<changefreq(?:\s[^>]*)?>\s*(.*?)\s*</changefreq>"
_PRIORITY_RE = r"(?s)<priority(?:\s[^>]*)?>\s*(.*?)\s*</priority>"

# (entity, char) — &amp; LAST (module doc).
_XML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def xml_unescape_column(col: Column) -> Column:
    for ent, ch in _XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _field(body: Column, rx: str) -> Column:
    """Extract + unescape one optional child element (NULL when
    absent — regexp_extract yields '' on no match, mapped to NULL;
    the contract's values are never empty strings)."""
    raw = F.regexp_extract(body, rx, 1)
    return F.when(raw != "", xml_unescape_column(raw))


def lastmod_ts_column(lastmod: Column) -> Column:
    """W3C datetime -> UTC timestamp: date-only or full datetime with
    a numeric/Z timezone, seconds optionally fractional. Out-of-shape
    values yield NULL (visible in the lastmod string column — never
    silently coerced)."""
    return F.coalesce(
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(
            lastmod, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
        ),
        F.try_to_timestamp(lastmod, F.lit("yyyy-MM-dd")),
    )


def parse_sitemap_entries(
    sitemaps: DataFrame,
    host_col: str = "host",
    url_col: str = "sitemap_url",
    xml_col: str = "xml",
) -> DataFrame:
    """(host, sitemap_url, xml) -> one row per record:
    ``host, sitemap_url, kind ('url'|'sitemap'), loc, lastmod,
    lastmod_ts, changefreq, priority`` — urlset and sitemapindex
    records in one pass (a file is one or the other; both regexes on
    every file costs two scans of small XML, zero extra shuffles)."""
    blocks = F.concat(
        F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), 1),
        F.regexp_extract_all(
            F.col(xml_col), F.lit(_SITEMAP_BLOCK_RE), 1
        ),
    )
    kinds = F.concat(
        F.transform(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK_RE), 1),
            lambda _: F.lit("url"),
        ),
        F.transform(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(_SITEMAP_BLOCK_RE), 1
            ),
            lambda _: F.lit("sitemap"),
        ),
    )
    rows = sitemaps.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("sitemap_url"),
        F.explode(F.arrays_zip(blocks.alias("body"), kinds.alias("kind"))).alias(
            "rec"
        ),
    ).select(
        "host",
        "sitemap_url",
        F.col("rec.kind").alias("kind"),
        F.col("rec.body").alias("body"),
    )
    lastmod = _field(F.col("body"), _LASTMOD_RE)
    return rows.select(
        "host",
        "sitemap_url",
        "kind",
        _field(F.col("body"), _LOC_RE).alias("loc"),
        lastmod.alias("lastmod"),
        lastmod_ts_column(lastmod).alias("lastmod_ts"),
        _field(F.col("body"), _CHANGEFREQ_RE).alias("changefreq"),
        _field(F.col("body"), _PRIORITY_RE).cast("double").alias(
            "priority"
        ),
    ).filter(F.col("loc").isNotNull())


def resolve_sitemap_index(entries: DataFrame) -> DataFrame:
    """Flatten one level of sitemapindex: URL records from directly-
    listed sitemaps pass through; URL records of a child sitemap
    named by an index gain the index's identity as ``via_index``
    (NULL for direct records). One host-keyed left join."""
    urls = entries.filter(F.col("kind") == "url").select(
        "host", "sitemap_url", "loc", "lastmod", "lastmod_ts",
        "changefreq", "priority",
    )
    index_refs = (
        entries.filter(F.col("kind") == "sitemap")
        .select(
            F.col("host").alias("idx_host"),
            F.col("loc").alias("child_url"),
            F.col("sitemap_url").alias("via_index"),
        )
    )
    return urls.join(
        index_refs,
        (urls["host"] == index_refs["idx_host"])
        & (urls["sitemap_url"] == index_refs["child_url"]),
        "left",
    ).select(
        "host",
        "sitemap_url",
        "via_index",
        "loc",
        "lastmod",
        "lastmod_ts",
        "changefreq",
        "priority",
    )


# --- Python twin (fixture composition asserts + differential tests) --


def _xml_unescape_py(s: str) -> str:
    for ent, ch in _XML_ENTITIES:
        s = s.replace(ent, ch)
    return s


def _field_py(body: str, rx: str) -> str | None:
    m = re.search(rx, body)
    if not m or m.group(1) == "":
        return None
    return _xml_unescape_py(m.group(1))


def parse_sitemap_py(xml: str) -> list[dict]:
    """Exact twin of parse_sitemap_entries for ONE file."""
    out = []
    for kind, block_rx in (("url", _URL_BLOCK_RE),
                           ("sitemap", _SITEMAP_BLOCK_RE)):
        for m in re.finditer(block_rx, xml):
            body = m.group(1)
            loc = _field_py(body, _LOC_RE)
            if loc is None:
                continue
            pr = _field_py(body, _PRIORITY_RE)
            out.append(
                {
                    "kind": kind,
                    "loc": loc,
                    "lastmod": _field_py(body, _LASTMOD_RE),
                    "changefreq": _field_py(body, _CHANGEFREQ_RE),
                    "priority": None if pr is None else float(pr),
                }
            )
    return out
