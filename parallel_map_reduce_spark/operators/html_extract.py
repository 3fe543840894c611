"""HTML/markup text extraction — the boilerplate-strip step every
web-crawl corpus passes through before tokenization (VERDICT r14 task
2; the reference ingests clean text only, so this is north-star
LLM-pipeline surface, not reference parity).

The extraction CONTRACT is a fixed, documented chain of regex rewrites
— deliberately expressible in BOTH engines (Spark's Java regex and
DuckDB's RE2) so the DuckDB oracle can re-derive it independently, and
deliberately codegen-resident on the Spark side (chained
``regexp_replace`` projections, zero Python, scan speed):

 1. ``<script>``/``<style>`` elements vanish WITH their content
    (their bodies are raw text per HTML parsing — a ``<!--`` inside
    JS is code, not a comment, which is why this runs first).
 2. Comments ``<!-- ... -->`` vanish WITHOUT inserting a space
    (browsers join ``a<!--x-->b`` to ``ab``; pinned by fixture).
 3. DOCTYPE declarations and processing instructions vanish.
 4. CDATA sections unwrap to their content. Documented approximation:
    a regex chain has no region memory, so later stages (tag strip,
    entity decode) still apply to the unwrapped content — XML-literal
    CDATA semantics are NOT claimed; the fixture pins the actual
    behavior (an entity inside CDATA decodes).
 5. Inline formatting tags (HTML_INLINE_TAGS) are removed with NO
    space — ``co<b>d</b>e`` reads ``code`` — while every other tag
    becomes ONE space — ``<p>a</p><p>b</p>`` reads ``a b``. Tag
    patterns skip over quoted attribute values, so ``<a title="a>b">``
    is one tag, and require a letter after ``<``/``</`` so stray
    angle brackets in prose (``3 < 4``) stay literal text.
 6. Character references decode from a FIXED table
    (HTML_ENTITY_TABLE): each entry decodes its named form and its
    numeric forms (decimal and hex, leading zeros, either hex case).
    ``&amp;`` decodes LAST so double-escapes resolve correctly
    (``&amp;lt;`` reads ``&lt;``, never ``<``). Entities OUTSIDE the
    table stay verbatim — visible, not silently dropped; HTML5's full
    2k-name table is data, not algorithm, and extends the same way.
 7. ASCII whitespace runs collapse to one space; the result is
    trimmed. (``&nbsp;`` decodes to a plain space in step 6, so it
    participates in the collapse — the usual extraction choice.)
    The collapse class is ENUMERATED — ``[ \\t\\n\\r\\f\\x0B]+`` — not
    the dialect shorthand ``\\s``: Java's ``\\s`` includes vertical
    tab (``\\x0B``) while RE2's does not, so the shorthand would
    silently diverge between the two engines on ``\\x0B`` input
    (advisor r15). The explicit class makes both engines collapse the
    same six ASCII whitespace characters.

Patterns use only the regex dialect BOTH engines share exactly: inline
flags ``(?is)``, lazy quantifiers, alternation over quoted runs, no
backreferences in patterns. The ONE engine asymmetry is replacement
syntax (Java ``$1`` vs RE2 ``\\1``), carried per-rule.

Scale: per-row projection, no shuffle, no state — partition-parallel
at any corpus size; the regex chain runs in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Inline formatting tags removed with NO space (everything else
# becomes a word separator).
HTML_INLINE_TAGS = (
    "a", "b", "i", "em", "strong", "u", "s", "span", "code",
    "sub", "sup", "small", "mark",
)

# (name, codepoint, replacement_text). Order matters only for amp —
# it MUST decode last (see module docstring step 6).
HTML_ENTITY_TABLE: tuple[tuple[str, int, str], ...] = (
    ("lt", 0x3C, "<"),
    ("gt", 0x3E, ">"),
    ("quot", 0x22, '"'),
    ("apos", 0x27, "'"),
    ("nbsp", 0xA0, " "),  # decodes to plain space by contract
    ("eacute", 0xE9, "é"),
    ("egrave", 0xE8, "è"),
    ("uuml", 0xFC, "ü"),
    ("ntilde", 0xF1, "ñ"),
    ("mdash", 0x2014, "—"),
    ("ndash", 0x2013, "–"),
    ("hellip", 0x2026, "…"),
    ("copy", 0xA9, "©"),
    ("reg", 0xAE, "®"),
    ("amp", 0x26, "&"),  # LAST: double-escapes must not re-decode
)

# A tag body: quoted attribute runs or any char except <>"'; the
# leading letter requirement keeps stray `<` in prose literal.
_TAG_BODY = "(?:\"[^\"]*\"|'[^']*'|[^<>\"'])*"


def _entity_pattern(name: str, cp: int) -> str:
    """``&name;`` / ``&#DDD;`` / ``&#xHH;`` (leading zeros, either hex
    case) for one table entry — built with per-character case classes
    so the SAME pattern string serves Java regex and RE2."""
    dec = str(cp)
    hexd = "".join(
        f"[{c.lower()}{c.upper()}]" if c.isalpha() else c
        for c in format(cp, "x")
    )
    return f"&(?:{name}|#0*{dec}|#[xX]0*{hexd});"


def _rules() -> list[tuple[str, str, str]]:
    """The ordered rewrite chain as (pattern, spark_replacement,
    duckdb_replacement) — the single source of truth both the Spark
    projection and the generated DuckDB oracle read."""
    rules: list[tuple[str, str, str]] = [
        (r"(?is)<script\b" + _TAG_BODY + r">.*?</script\s*>", " ", " "),
        (r"(?is)<style\b" + _TAG_BODY + r">.*?</style\s*>", " ", " "),
        (r"(?s)<!--.*?-->", "", ""),
        (r"(?i)<!DOCTYPE[^>]*>", " ", " "),
        (r"(?s)<\?.*?\?>", " ", " "),
        (r"(?s)<!\[CDATA\[(.*?)\]\]>", "$1", r"\1"),
        (
            r"(?i)</?(?:" + "|".join(HTML_INLINE_TAGS) + r")\b"
            + _TAG_BODY + r">",
            "",
            "",
        ),
        (r"</?[a-zA-Z]" + _TAG_BODY + r">", " ", " "),
    ]
    rules += [
        (_entity_pattern(name, cp), text, text)
        for name, cp, text in HTML_ENTITY_TABLE
    ]
    # Enumerated ASCII whitespace class, NOT \s: Java \s includes
    # \x0B, RE2 \s does not (docstring step 7 / advisor r15).
    rules.append((r"[ \t\n\r\f\x0B]+", " ", " "))
    return rules


HTML_EXTRACT_RULES = _rules()


def html_text_column(col: Column | str) -> Column:
    """The extraction chain as one nested codegen expression."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, spark_rep, _ in HTML_EXTRACT_RULES:
        out = F.regexp_replace(out, pattern, spark_rep)
    return F.trim(out)


def html_extract_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, text, n_chars): extracted plain text per document."""
    text = html_text_column(html_col).alias("text")
    return df.select("doc_id", text).select(
        "doc_id", "text", F.length("text").cast("bigint").alias("n_chars")
    )


def html_extract_duckdb_expr(col: str) -> str:
    """The SAME chain as a DuckDB SQL expression (RE2, global flag,
    ``\\1`` replacements) — the oracle's side of the contract."""
    out = col
    for pattern, _, duck_rep in HTML_EXTRACT_RULES:
        # Standard SQL literals don't process backslashes, so \1 and
        # \s+ pass through verbatim; only quotes need doubling.
        p = pattern.replace("'", "''")
        r = duck_rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"
