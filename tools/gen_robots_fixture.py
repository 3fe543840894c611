"""Generate the committed robots.txt fixture
(refdata/robots_fixture.parquet).

The RFC 9309 exclusion contract (operators/robots.py) needs a fixture
where every verdict is KNOWN BY CONSTRUCTION: each of the 20 host
templates composes a robots.txt body together with three URL paths
whose allow/deny outcome — and the exact winning rule — follows from
how the template was built (disjoint rule prefixes except deliberate
override/tie pairs, wildcard markers no other path carries), never
from running a matcher. The templates cover the spec's surface:
prefix rules, longest-match override chains, allow-wins ties, ``*``
wildcards (leading, middle, with ``$`` anchors), exact-match ``$``,
named-group-suppresses-``*`` (including an EMPTY named group),
merged duplicate groups, consecutive user-agent lines, groupless
leading rules, empty ``Disallow:`` values, unknown directives inside
a group, directive/agent case-insensitivity vs path case-sensitivity,
comments, and CRLF line endings.

One row per doc_id 0..1999: ``doc_id BIGINT, host VARCHAR,
robots_txt VARCHAR, path VARCHAR, exp_allowed BOOLEAN, exp_rule
VARCHAR (NULL = no rule matched), exp_rule_len INTEGER``. doc_id ->
template t = doc_id % 20, block kb = doc_id // 60, slot = (doc_id //
20) % 3; host = ``h{t}-{kb}.example`` (three slots share one body, so
the winner aggregation is exercised per host). The operator's Python
twin is asserted against the composed expectation for EVERY row at
generation time — a twin bug aborts generation rather than shipping
a wrong fixture. Deterministic by construction (no RNG, no time).

Usage: python tools/gen_robots_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_DOCS = 2000
N_TEMPLATES = 20
AGENT = "sparkbot"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "robots_fixture.parquet",
)

ALLOW = True
DENY = False


def _t0(kb):
    """Empty body -> everything allowed."""
    return "", [
        (f"/any/{kb}", ALLOW, None),
        ("/", ALLOW, None),
        (f"/deep/p{kb}/q", ALLOW, None),
    ]


def _t1(kb):
    """Comments and unknown directives only -> no groups, allowed."""
    body = (
        f"# robots for block {kb}\n"
        "Sitemap: https://example.com/sitemap.xml\n"
        "Crawl-delay: 10\n"
        "# end\n"
    )
    return body, [
        (f"/x{kb}", ALLOW, None),
        ("/private/", ALLOW, None),
        (f"/a/b{kb}", ALLOW, None),
    ]


def _t2(kb):
    """Plain * group with disjoint prefix rules."""
    body = "User-agent: *\nDisallow: /private/\nDisallow: /cgi-bin/\n"
    return body, [
        (f"/private/p{kb}", DENY, "/private/"),
        (f"/public/p{kb}", ALLOW, None),
        (f"/cgi-bin/x{kb}", DENY, "/cgi-bin/"),
    ]


def _t3(kb):
    """Named group suppresses the * group entirely."""
    body = (
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: sparkbot\nDisallow: /tmp/\n"
    )
    return body, [
        (f"/home/a{kb}", ALLOW, None),
        (f"/tmp/b{kb}", DENY, "/tmp/"),
        ("/", ALLOW, None),
    ]


def _t4(kb):
    """A group for another bot only -> sparkbot unrestricted."""
    body = f"User-agent: otherbot\nDisallow: /\nDisallow: /s{kb}/\n"
    return body, [
        (f"/secret/x{kb}", ALLOW, None),
        (f"/s{kb}/y", ALLOW, None),
        ("/", ALLOW, None),
    ]


def _t5(kb):
    """Longest-match override: Allow under a Disallow prefix."""
    body = "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"
    return body, [
        (f"/private/x{kb}", DENY, "/private/"),
        (f"/private/pub/y{kb}", ALLOW, "/private/pub/"),
        (f"/open/z{kb}", ALLOW, None),
    ]


def _t6(kb):
    """Equal-length tie -> Allow wins (RFC 9309 §2.2.2)."""
    body = "User-agent: *\nAllow: /dir/\nDisallow: /dir/\n"
    return body, [
        (f"/dir/z{kb}", ALLOW, "/dir/"),
        ("/dir/", ALLOW, "/dir/"),
        (f"/other/{kb}", ALLOW, None),
    ]


def _t7(kb):
    """Wildcard + anchor rules; markers no other path carries."""
    body = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /*?sid=\n"
    return body, [
        (f"/docs/f{kb}.pdf", DENY, "/*.pdf$"),
        (f"/docs/f{kb}.pdfx", ALLOW, None),
        (f"/p{kb}?sid=9", DENY, "/*?sid="),
    ]


def _t8(kb):
    """Rules before any user-agent line belong to no group."""
    body = (
        f"Disallow: /led{kb}/\n"
        "User-agent: *\nDisallow: /real/\n"
    )
    return body, [
        (f"/led{kb}/a", ALLOW, None),
        (f"/real/b{kb}", DENY, "/real/"),
        (f"/free/c{kb}", ALLOW, None),
    ]


def _t9(kb):
    """Two * groups merge (union of rules)."""
    body = (
        "User-agent: *\nDisallow: /m1/\n\n"
        "User-agent: *\nDisallow: /m2/\n"
    )
    return body, [
        (f"/m1/a{kb}", DENY, "/m1/"),
        (f"/m2/b{kb}", DENY, "/m2/"),
        (f"/m3/c{kb}", ALLOW, None),
    ]


def _t10(kb):
    """Consecutive user-agent lines open ONE group."""
    body = (
        "User-agent: otherbot\nUser-agent: sparkbot\n"
        "Disallow: /both/\n"
    )
    return body, [
        (f"/both/c{kb}", DENY, "/both/"),
        (f"/solo/d{kb}", ALLOW, None),
        ("/both", ALLOW, None),  # prefix is /both/ — no match
    ]


def _t11(kb):
    """Empty Disallow value matches nothing; real rule still applies."""
    body = "User-agent: *\nDisallow:\nDisallow: /tmp/\n"
    return body, [
        (f"/any/x{kb}", ALLOW, None),
        (f"/tmp/y{kb}", DENY, "/tmp/"),
        ("/", ALLOW, None),
    ]


def _t12(kb):
    """$ without wildcard = exact path match only."""
    body = f"User-agent: *\nDisallow: /exact{kb}$\n"
    return body, [
        (f"/exact{kb}", DENY, f"/exact{kb}$"),
        (f"/exact{kb}/sub", ALLOW, None),
        (f"/exact{kb}x", ALLOW, None),
    ]


def _t13(kb):
    """Directive names and agent tokens are case-insensitive; PATHS
    are case-sensitive."""
    body = f"USER-AGENT: SparkBot\nDisAllow: /cs{kb}/\n"
    return body, [
        (f"/cs{kb}/x", DENY, f"/cs{kb}/"),
        (f"/CS{kb}/x", ALLOW, None),
        (f"/cs{kb}", ALLOW, None),
    ]


def _t14(kb):
    """A named group with NO rules still suppresses the * group."""
    body = (
        "User-agent: *\nDisallow: /\n\n"
        "User-agent: sparkbot\n"
        "Crawl-delay: 2\n"
    )
    return body, [
        (f"/anything/{kb}", ALLOW, None),
        ("/", ALLOW, None),
        (f"/deep/x{kb}", ALLOW, None),
    ]


def _t15(kb):
    """Leading-wildcard pattern: /*/old/ needs a path segment before
    /old/ — the pattern's leading '/' consumes the root slash, so
    top-level /old/ does NOT match."""
    body = "User-agent: *\nDisallow: /*/old/\n"
    return body, [
        (f"/v{kb}/old/f", DENY, "/*/old/"),
        ("/old/f", ALLOW, None),
        (f"/v{kb}/new/f", ALLOW, None),
    ]


def _t16(kb):
    """Override chain: longest of three nested prefixes wins."""
    body = (
        "User-agent: *\nDisallow: /a/\nAllow: /a/b/\n"
        "Disallow: /a/b/c/\n"
    )
    return body, [
        (f"/a/x{kb}", DENY, "/a/"),
        (f"/a/b/x{kb}", ALLOW, "/a/b/"),
        (f"/a/b/c/x{kb}", DENY, "/a/b/c/"),
    ]


def _t17(kb):
    """Two sparkbot groups merge; unknown directive inside a group
    does not split it."""
    body = (
        "User-agent: sparkbot\nDisallow: /g1/\n\n"
        "User-agent: sparkbot\nCrawl-delay: 1\nDisallow: /g2/\n"
    )
    return body, [
        (f"/g1/a{kb}", DENY, "/g1/"),
        (f"/g2/b{kb}", DENY, "/g2/"),
        (f"/g3/c{kb}", ALLOW, None),
    ]


def _t18(kb):
    """CRLF endings, trailing comments after values, extra spaces."""
    body = (
        "User-agent: *   # all crawlers\r\n"
        f"Disallow:   /ws{kb}/   # keep out\r\n"
    )
    return body, [
        (f"/ws{kb}/x", DENY, f"/ws{kb}/"),
        (f"/ok{kb}/x", ALLOW, None),
        (f"/ws{kb}", ALLOW, None),
    ]


def _t19(kb):
    """Middle wildcard with multi-part anchored suffix."""
    body = "User-agent: *\nDisallow: /dl/*.tar.gz$\n"
    return body, [
        (f"/dl/a{kb}.tar.gz", DENY, "/dl/*.tar.gz$"),
        (f"/dl/a{kb}.tar.gz.md5", ALLOW, None),
        (f"/src/a{kb}.tar.gz", ALLOW, None),
    ]


TEMPLATES = [
    _t0, _t1, _t2, _t3, _t4, _t5, _t6, _t7, _t8, _t9, _t10, _t11,
    _t12, _t13, _t14, _t15, _t16, _t17, _t18, _t19,
]
assert len(TEMPLATES) == N_TEMPLATES


def doc(doc_id: int):
    """(host, robots_txt, path, exp_allowed, exp_rule) for one row."""
    t = doc_id % N_TEMPLATES
    slot = (doc_id // N_TEMPLATES) % 3
    kb = doc_id // (N_TEMPLATES * 3)
    body, cases = TEMPLATES[t](kb)
    path, allowed, rule = cases[slot]
    return f"h{t}-{kb}.example", body, path, allowed, rule


def main() -> None:
    from parallel_map_reduce_spark.operators.robots import (
        robots_allowed_py,
    )

    rows = []
    for doc_id in range(N_DOCS):
        host, body, path, allowed, rule = doc(doc_id)
        got = robots_allowed_py(body, AGENT, path)
        exp = (allowed, rule, None if rule is None else len(rule))
        assert got == exp, (doc_id, host, path, got, exp)
        rows.append((doc_id, host, body, path, *exp))

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "host": pa.array([r[1] for r in rows], pa.string()),
            "robots_txt": pa.array([r[2] for r in rows], pa.string()),
            "path": pa.array([r[3] for r in rows], pa.string()),
            "exp_allowed": pa.array([r[4] for r in rows], pa.bool_()),
            "exp_rule": pa.array([r[5] for r in rows], pa.string()),
            "exp_rule_len": pa.array([r[6] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    denied = sum(1 for r in rows if not r[4])
    print(
        f"wrote {OUT}: {len(rows)} rows, {denied} denied, "
        f"{len({r[1] for r in rows})} hosts"
    )


if __name__ == "__main__":
    main()
