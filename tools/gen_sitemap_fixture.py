"""Generate the committed sitemap fixture
(refdata/sitemap_fixture.parquet inputs +
refdata/sitemap_expected.parquet sidecar).

The sitemap contract (operators/sitemap.py) is proven the WARC way:
the INPUT table holds composed sitemap XML BYTES (one row per
sitemap file), the SIDECAR holds one row per expected resolved URL
record — authored from what the generator COMPOSED, never from
running a parser.

The host universe is the ROBOTS fixture's (tools/gen_robots_fixture:
``h{t}-{kb}.example``), and each host's sitemap lists exactly its
three robots-slot paths plus one ``/sitemap-extra/`` decoration path
— chosen so NO robots template carries a rule matching it, making
its allow-verdict construction knowledge on every host. That lets
the SAME sidecar carry the robots verdict columns, so
``crawl_sitemap_frontier`` (sitemap parse -> path extract -> RFC
9309 filter) is oracle-checkable end-to-end from composition: the
XML parse, the index resolution, the W3C lastmod parse (the sidecar
stores the epoch the generator composed the string FROM), and the
politeness verdict all must agree with what was built.

Shape cycles (deterministic, no RNG, no time):
* every 5th host ships a SITEMAPINDEX naming two child urlsets that
  split the URL list; the rest ship one direct urlset;
* lastmod cycles date-only / UTC-Z / +02:00-offset / absent;
  changefreq and priority cycle with absences;
* pretty multiline vs compact one-line XML alternates; every 3rd
  ``<url>`` element carries a decorative attribute; the extra path's
  query string exercises ``&amp;`` entity unescape.

Verification at generation time: the sitemap Python twin re-parses
every composed file and must reproduce the sidecar rows exactly, and
the robots twin must agree with every composed verdict — either
failing aborts generation.

Usage: python tools/gen_sitemap_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.gen_robots_fixture import (  # noqa: E402
    AGENT,
    N_DOCS,
    N_TEMPLATES,
    TEMPLATES,
)

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "refdata"
)
INPUTS_OUT = os.path.join(OUT_DIR, "sitemap_fixture.parquet")
SIDECAR_OUT = os.path.join(OUT_DIR, "sitemap_expected.parquet")

N_BLOCKS = N_DOCS // (N_TEMPLATES * 3)  # kb blocks in the robots fixture

LASTMODS = [
    ("2024-01-15", 1705276800000000),  # date-only -> UTC midnight
    ("2024-06-30T12:34:56Z", 1719750896000000),
    ("2023-11-05T08:00:00+02:00", 1699164000000000),
    (None, None),
]
CHANGEFREQS = ["daily", "weekly", None, "monthly", None]
PRIORITIES = [0.5, None, 0.8, 1.0, None, 0.1]

XMLNS = ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _url_el(i: int, loc: str, lastmod, changefreq, priority,
            pretty: bool) -> str:
    attr = ' data-x="1"' if i % 3 == 0 else ""
    fields = [f"<loc>{_xml_escape(loc)}</loc>"]
    if lastmod is not None:
        fields.append(f"<lastmod>{lastmod}</lastmod>")
    if changefreq is not None:
        fields.append(f"<changefreq>{changefreq}</changefreq>")
    if priority is not None:
        fields.append(f"<priority>{priority}</priority>")
    if pretty:
        inner = "\n    " + "\n    ".join(fields) + "\n  "
        return f"  <url{attr}>{inner}</url>"
    return f"<url{attr}>{''.join(fields)}</url>"


def _urlset(urls: list[str], pretty: bool) -> str:
    head = '<?xml version="1.0" encoding="UTF-8"?>\n'
    if pretty:
        return (
            head + f"<urlset{XMLNS}>\n" + "\n".join(urls) + "\n</urlset>\n"
        )
    return head + f"<urlset{XMLNS}>" + "".join(urls) + "</urlset>"


def _sitemapindex(children: list[tuple[str, str | None]],
                  pretty: bool) -> str:
    els = []
    for loc, lastmod in children:
        f = f"<loc>{_xml_escape(loc)}</loc>"
        if lastmod is not None:
            f += f"<lastmod>{lastmod}</lastmod>"
        els.append(f"  <sitemap>{f}</sitemap>" if pretty
                   else f"<sitemap>{f}</sitemap>")
    head = '<?xml version="1.0" encoding="UTF-8"?>\n'
    if pretty:
        return (head + f"<sitemapindex{XMLNS}>\n" + "\n".join(els)
                + "\n</sitemapindex>\n")
    return head + f"<sitemapindex{XMLNS}>" + "".join(els) + "</sitemapindex>"


def host_case(t: int, kb: int):
    """(host, robots_body, [(path, allowed, rule)] incl. the extra
    decoration path) — construction knowledge."""
    body, cases = TEMPLATES[t](kb)
    host = f"h{t}-{kb}.example"
    # /sitemap-extra/ matches NO template's rule set (verified by the
    # generation-time robots-twin assert): allow by default; its
    # query string exercises entity unescape.
    extra = (f"/sitemap-extra/x{kb}?a=1&b=2", True, None)
    return host, body, list(cases) + [extra]


def build(t: int, kb: int):
    """-> (input rows, sidecar rows) for one host."""
    host, robots_body, cases = host_case(t, kb)
    seq = t + kb * N_TEMPLATES
    pretty = seq % 2 == 0
    urls, sidecar = [], []
    for i, (path, allowed, rule) in enumerate(cases):
        loc = f"https://{host}{path}"
        lastmod, epoch = LASTMODS[(seq + i) % len(LASTMODS)]
        cf = CHANGEFREQS[(seq + i) % len(CHANGEFREQS)]
        pr = PRIORITIES[(seq + i) % len(PRIORITIES)]
        urls.append((i, loc, lastmod, cf, pr))
        sidecar.append(
            {
                "t": t,
                "kb": kb,
                "host": host,
                "loc": loc,
                "path": path,
                "lastmod": lastmod,
                "lastmod_epoch_us": epoch,
                "changefreq": cf,
                "priority": pr,
                "exp_allowed": allowed,
                "exp_rule": rule,
                "exp_rule_len": None if rule is None else len(rule),
            }
        )
    inputs = []
    if t % 5 == 1:
        # sitemapindex: two children splitting the list
        part1 = urls[:2]
        part2 = urls[2:]
        c1 = f"https://{host}/sm-part1.xml"
        c2 = f"https://{host}/sm-part2.xml"
        idx_url = f"https://{host}/sitemap_index.xml"
        inputs.append(
            (host, idx_url,
             _sitemapindex([(c1, LASTMODS[seq % 4][0]), (c2, None)],
                           pretty))
        )
        for curl, part in ((c1, part1), (c2, part2)):
            els = [_url_el(i, loc, lm, cf, pr, pretty)
                   for i, loc, lm, cf, pr in part]
            inputs.append((host, curl, _urlset(els, pretty)))
        for s in sidecar:
            in_p1 = s["loc"] in {u[1] for u in part1}
            s["sitemap_url"] = c1 if in_p1 else c2
            s["via_index"] = idx_url
    else:
        sm_url = f"https://{host}/sitemap.xml"
        els = [_url_el(i, loc, lm, cf, pr, pretty)
               for i, loc, lm, cf, pr in urls]
        inputs.append((host, sm_url, _urlset(els, pretty)))
        for s in sidecar:
            s["sitemap_url"] = sm_url
            s["via_index"] = None
    return inputs, sidecar


def main() -> None:
    from parallel_map_reduce_spark.operators.robots import (
        robots_allowed_py,
    )
    from parallel_map_reduce_spark.operators.sitemap import (
        parse_sitemap_py,
    )

    all_inputs, all_sidecar = [], []
    # The robots fixture's full host universe: doc_id = 60*kb + 20*slot
    # + t over doc_id 0..1999 -> kb 0..33, t 0..19 (680 hosts).
    for kb in range(N_BLOCKS + 1):
        for t in range(N_TEMPLATES):
            inputs, sidecar = build(t, kb)
            host, robots_body, cases = host_case(t, kb)
            # twin assert 1: robots verdicts == composition
            for path, allowed, rule in cases:
                got = robots_allowed_py(robots_body, AGENT, path)
                exp = (allowed, rule,
                       None if rule is None else len(rule))
                assert got == exp, (host, path, got, exp)
            # twin assert 2: sitemap twin re-parse == composition
            parsed_urls = {}
            index_children = {}
            for h, sm_url, xml in inputs:
                for rec in parse_sitemap_py(xml):
                    if rec["kind"] == "url":
                        parsed_urls[rec["loc"]] = (
                            sm_url, rec["lastmod"], rec["changefreq"],
                            rec["priority"],
                        )
                    else:
                        index_children[rec["loc"]] = sm_url
            assert len(parsed_urls) == len(sidecar)
            for s in sidecar:
                sm_url, lm, cf, pr = parsed_urls[s["loc"]]
                assert sm_url == s["sitemap_url"], (s, sm_url)
                assert lm == s["lastmod"] and cf == s["changefreq"]
                assert pr == s["priority"], (s, pr)
                assert index_children.get(s["sitemap_url"]) == s[
                    "via_index"
                ]
            all_inputs.extend(inputs)
            all_sidecar.extend(sidecar)

    pq.write_table(
        pa.table(
            {
                "host": pa.array([r[0] for r in all_inputs]),
                "sitemap_url": pa.array([r[1] for r in all_inputs]),
                "xml": pa.array([r[2] for r in all_inputs]),
            }
        ),
        INPUTS_OUT,
        compression="zstd",
    )
    cols = ["t", "kb", "host", "sitemap_url", "via_index", "loc",
            "path", "lastmod", "lastmod_epoch_us", "changefreq",
            "priority", "exp_allowed", "exp_rule", "exp_rule_len"]
    arrays = {}
    for c in cols:
        vals = [s[c] for s in all_sidecar]
        if c in ("t", "kb"):
            arrays[c] = pa.array(vals, pa.int32())
        elif c == "lastmod_epoch_us":
            arrays[c] = pa.array(vals, pa.int64())
        elif c == "priority":
            arrays[c] = pa.array(vals, pa.float64())
        elif c == "exp_allowed":
            arrays[c] = pa.array(vals, pa.bool_())
        elif c == "exp_rule_len":
            arrays[c] = pa.array(vals, pa.int32())
        else:
            arrays[c] = pa.array(vals, pa.string())
    pq.write_table(pa.table(arrays), SIDECAR_OUT, compression="zstd")
    n_idx = sum(1 for _, u, _x in all_inputs if "index" in u)
    print(
        f"wrote {len(all_inputs)} sitemap files ({n_idx} indexes) and "
        f"{len(all_sidecar)} sidecar rows over "
        f"{len({r[0] for r in all_inputs})} hosts"
    )


if __name__ == "__main__":
    main()
