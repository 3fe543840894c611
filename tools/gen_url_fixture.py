"""Generate the committed URL fixture (refdata/url_fixture.parquet).

The URL-canonicalization contract (operators/url_canon.py) needs a
fixture where MANY messy spellings map to ONE known canonical page
identity — the generator composes each row from a canonical identity
(host, path, sorted params) it knows, then applies deterministic mess:
scheme/host case noise, ``www.``, default ports, fragments, tracking
parameters, parameter-order rotation, trailing slashes, userinfo,
%-encoded unreserved path characters (either hex case), and some
non-URL rows that must pass through verbatim. ``exp_canonical``
derives from the COMPOSITION, never from the canonicalization code —
circularity-free, the html/nfc fixture discipline.

One row per doc_id 0..1999: doc_id BIGINT, url VARCHAR, exp_canonical
VARCHAR. Deterministic by construction (no RNG, no time).

Usage: python tools/gen_url_fixture.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 2000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "url_fixture.parquet",
)

HOSTS = ["example.com", "data.example.org", "crawl.net", "docs.io"]
PATHS = ["/", "/index.html", "/a/b", "/Train/Data", "/p/q/r", "/dl"]
# (key, value) pools for REAL params — keys chosen outside the
# tracking list; values vary per doc.
PARAM_KEYS = ["id", "page", "q", "lang", "v"]
TRACKING = ["utm_source=feed", "utm_campaign=x", "gclid=g123",
            "fbclid=f456", "ref=home", "mc_cid=abc"]
NON_URLS = ["not a url", "/relative/only?x=1", "mailto:a@b.c",
            "example.com/no-scheme"]


def identity(doc_id: int) -> tuple[str, str, list[str]]:
    """The canonical (host, path, params) this doc's URL spells."""
    g = doc_id % 500  # 500 distinct pages -> ~4 variants each
    host = HOSTS[g % len(HOSTS)]
    path = PATHS[(g * 7) % len(PATHS)]
    n_params = g % 3
    params = sorted(
        f"{PARAM_KEYS[(g + j) % len(PARAM_KEYS)]}={(g * 3 + j) % 97}"
        for j in range(n_params)
    )
    return host, path, params


def doc(doc_id: int) -> tuple[str, str]:
    if doc_id % 25 == 24:
        raw = NON_URLS[doc_id % len(NON_URLS)]
        return raw, raw  # non-URLs pass through verbatim
    host, path, params = identity(doc_id)
    scheme = "https" if doc_id % 3 else "http"
    # canonical form (path '/' stays '/', else no trailing slash)
    cpath = path if path != "/" else "/"
    cq = "?" + "&".join(params) if params else ""
    canonical = f"{scheme}://{host}{cpath}{cq}"

    # messy spelling
    v = doc_id // 500  # variant index 0..3
    mhost = host.upper() if v % 2 else host
    if (doc_id + 1) % 4 == 0:
        mhost = "www." + mhost
    if (doc_id + 2) % 5 == 0:
        mhost += ":443" if scheme == "https" else ":80"
    if (doc_id + 3) % 11 == 0:
        mhost = "crawler:secret@" + mhost
    mscheme = scheme.upper() if v >= 2 else scheme
    mpath = path
    if path != "/" and (doc_id + v) % 7 == 1:
        # %-encode the first letter of the path (alternating hex case):
        # unreserved decode must fold this back to the canonical form
        first = next((c for c in mpath if c.isalpha()), None)
        if first is not None:
            hh = format(ord(first), "02x")
            enc = "%" + (hh.upper() if doc_id % 2 else hh)
            mpath = mpath.replace(first, enc, 1)
    if path != "/" and (doc_id + v) % 3 == 0:
        mpath += "/" * (1 + doc_id % 2)
    if (doc_id + v) % 9 in (4, 5):
        # dot-segment mess (r16): every spelling provably removes to
        # the canonical path under RFC 3986 §5.2.4 — leading ./ and
        # ../-at-root, single and nested pops, a trailing pop, and an
        # empty-segment pop ("//..": the empty segment pops like any
        # other). Shapes mirror tests/test_url_canon.py's pinned cases.
        m = doc_id % 5
        if mpath == "/":
            mpath = ["/..", "/.", "/x/..", "/x/y/../..", "/./."][m]
        else:
            mpath = [
                "/." + mpath,
                "/x/.." + mpath,
                "/x/y/../.." + mpath,
                mpath + "/zz/..",  # appended pop cancels itself
                "//.." + mpath,
            ][m]
    mparams = list(params)
    for k in range((doc_id + v) % 3):
        mparams.append(TRACKING[(doc_id + k) % len(TRACKING)])
    rot = (doc_id + v) % max(len(mparams), 1)
    mparams = mparams[rot:] + mparams[:rot]
    mq = "?" + "&".join(mparams) if mparams else ""
    frag = f"#sec{doc_id % 7}" if (doc_id + 5) % 6 == 0 else ""
    url = f"{mscheme}://{mhost}{mpath}{mq}{frag}"
    return url, canonical


def main() -> int:
    ids, urls, exps = [], [], []
    for d in range(N_DOCS):
        u, e = doc(d)
        ids.append(d)
        urls.append(u)
        exps.append(e)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "exp_canonical": pa.array(exps, pa.string()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    n_groups = len(set(exps))
    print(
        f"wrote {OUT}: {table.num_rows} rows, {n_groups} canonical groups, "
        f"{os.path.getsize(OUT)} bytes"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
