"""Generate the committed HTML fixture (refdata/html_fixture.parquet).

Web-crawl corpora pass through boilerplate-strip before tokenization;
the HTML extraction contract (operators/html_extract.py) needs a
fixture whose EXPECTED text derives from the generator's own knowledge
of composition — the image-fixture discipline: each document is built
from (html_fragment, text_contribution) pieces authored BY HAND, so
``exp_text`` is computed from the contributions, never by running the
extraction regexes (that would be circular). Three independent checks
then triangulate:

  - pytest: Spark extraction == exp_text for every fixture row,
  - the DuckDB oracle: RE2 re-derivation of the chain vs Spark's Java
    regex side (the driver's hash gate),
  - both of those against the generator's composition knowledge.

One row per doc_id 0..1999: doc_id BIGINT, html VARCHAR, exp_text
VARCHAR. Docs cycle through piece templates covering the contract's
nasty cases: nested/inline/block tags, quoted attributes containing
``>``, script/style bodies containing markup and comparison operators,
comments (including one straddling a word), CDATA with an entity
inside (pinning the documented decode-inside-CDATA approximation),
DOCTYPE/processing instructions, named/decimal/hex/leading-zero
character references, double escapes, unknown entities (kept
verbatim), and bare ``<``/``>`` in prose (kept literal).

Deterministic by construction (no RNG, no time).

Usage: python tools/gen_html_fixture.py
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 2000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "html_fixture.parquet",
)

WORDS = [
    "data", "pipeline", "corpus", "crawl", "token", "model", "train",
    "filter", "shard", "batch", "vector", "index", "query", "stream",
    "merge", "sample", "weight", "layer", "graph", "cache",
]


def _w(doc_id: int, i: int, k: int) -> str:
    return WORDS[(doc_id * 13 + i * 5 + k * 3) % len(WORDS)]


def _sentence(doc_id: int, i: int) -> str:
    n = 3 + (doc_id + i) % 5
    return " ".join(_w(doc_id, i, 10 + j) for j in range(n))


# Each piece: (doc_id, i) -> (html_fragment, text_contribution).
def _p_para(d, i):
    s = _sentence(d, i)
    return f"<p>{s}</p>", s


def _p_heading_list(d, i):
    a, b, c = _w(d, i, 0), _w(d, i, 1), _w(d, i, 2)
    return (
        f"<h2>{a}</h2><ul><li>{b}</li><li>{c}</li></ul>",
        f"{a} {b} {c}",
    )


def _p_inline(d, i):
    a, b, c, e = _w(d, i, 0), _w(d, i, 1), _w(d, i, 2), _w(d, i, 3)
    return (
        f"{a} <b>{b}</b> <em>{c}</em> co<i>d</i>e {e}",
        f"{a} {b} {c} code {e}",
    )


def _p_link_nasty_attr(d, i):
    a, b, c, e, f = (_w(d, i, k) for k in range(5))
    return (
        f'<a title="{a}>{b}" href="https://example.com/{c}">{e}</a> {f}',
        f"{e} {f}",
    )


def _p_comment(d, i):
    return f"<!-- {_sentence(d, i)} -->", ""


def _p_straddling_comment(d, i):
    a, b = _w(d, i, 0), _w(d, i, 1)
    return f"{a}<!-- hidden -->{b}", f"{a}{b}"


def _p_script(d, i):
    a = _w(d, i, 0)
    return (
        "<script type=\"text/javascript\">var a = 1 < 2; "
        f"if (a > 0) {{ log(\"{a}\"); }} s = '</p>';</script>",
        "",
    )


def _p_style(d, i):
    return "<style>.x > .y { margin: 0; }</style>", ""


def _p_cdata(d, i):
    a, b = _w(d, i, 0), _w(d, i, 1)
    return f"<![CDATA[{a} &amp; {b}]]>", f"{a} & {b}"


def _p_entities(d, i):
    a, b, c = _w(d, i, 0), _w(d, i, 1), _w(d, i, 2)
    return (
        f"{a} &amp; {b} &lt;tag&gt; caf&#233; &hellip; &unknown; {c}",
        f"{a} & {b} <tag> café … &unknown; {c}",
    )


def _p_numeric_zoo(d, i):
    a = _w(d, i, 0)
    return (
        f"A&#0233;B &#x2014; C&#xe9;D &nbsp; {a} &#X00A9;",
        f"AéB — CéD {a} ©",
    )


def _p_double_escape(d, i):
    return "use &amp;lt; for a literal &amp;amp; too", (
        "use &lt; for a literal &amp; too"
    )


def _p_table(d, i):
    a, b = _w(d, i, 0), _w(d, i, 1)
    return (
        f"<table><tr><td>{a}</td><td>{b}</td></tr></table>",
        f"{a} {b}",
    )


def _p_math_prose(d, i):
    a, b = _w(d, i, 0), _w(d, i, 1)
    return f"{a} 3 < 4 but 9 > 7 {b}", f"{a} 3 < 4 but 9 > 7 {b}"


def _p_void_and_img(d, i):
    a, b, c, e = (_w(d, i, k) for k in range(4))
    return (
        f'{a} <br/> <img src="x.png" alt="{b} > {c}"/> {e}',
        f"{a} {e}",
    )


def _p_nested_div(d, i):
    a, b = _w(d, i, 0), _w(d, i, 1)
    return (
        f"<div><div class='outer'><span>{a}</span> {b}</div></div>",
        f"{a} {b}",
    )


def _p_full_doc_head(d, i):
    t, s = _w(d, i, 0), _sentence(d, i)
    return (
        "<!DOCTYPE html><?xml-stylesheet type=\"text/css\"?>"
        f"<html lang=\"en\"><head><title>{t}</title>"
        f"<meta charset=\"utf-8\"/></head><body>{s}</body></html>",
        f"{t} {s}",
    )


PIECES = [
    _p_para, _p_heading_list, _p_inline, _p_link_nasty_attr, _p_comment,
    _p_straddling_comment, _p_script, _p_style, _p_cdata, _p_entities,
    _p_numeric_zoo, _p_double_escape, _p_table, _p_math_prose,
    _p_void_and_img, _p_nested_div, _p_full_doc_head,
]

# ASCII whitespace only. The operator's collapse class is now the
# enumerated [ \t\n\r\f\x0B]+ (advisor r15) so \x0B no longer
# diverges between engines; the pools still omit it because the
# expectation composer here collapses the same five common chars.
_WS = re.compile(r"[ \t\n\r\f]+")


def doc(doc_id: int) -> tuple[str, str]:
    n_pieces = 3 + (doc_id * 7) % 5
    frags, texts = [], []
    for i in range(n_pieces):
        piece = PIECES[(doc_id * 11 + i * 3) % len(PIECES)]
        h, t = piece(doc_id, i)
        frags.append(h)
        texts.append(t)
    html = "\n".join(frags)
    exp = _WS.sub(" ", " ".join(texts)).strip()
    return html, exp


def main() -> int:
    ids, htmls, exps = [], [], []
    for d in range(N_DOCS):
        h, e = doc(d)
        ids.append(d)
        htmls.append(h)
        exps.append(e)
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "html": pa.array(htmls, pa.string()),
            "exp_text": pa.array(exps, pa.string()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {OUT}: {table.num_rows} rows, {os.path.getsize(OUT)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
