"""Unicode NFC composition for the normalization contract (VERDICT r14
task 3; domain widened to the FULL generated table in r16 per VERDICT
r15 task 2): Spark 4.1 exposes no unicode-normalize builtin (probed:
``normalize``/``nfc`` unresolved; ICU surfaces only through collations,
which give equivalence-at-compare, not a transform), so the Spark side
implements composition as pure codegen expressions — zero Python at
runtime:

1. **Cluster split**: ``split(text, CLUSTER_SPLIT_REGEX)`` breaks the
   string before every character that is neither a combining mark nor
   a Hangul V/T jamo, so each piece is one starter plus its combining
   sequence (or one L jamo plus V/T).
2. **Hangul LV/LVT composition is ALGORITHMIC** (UAX #15 / Unicode
   ch. 3.12 arithmetic): syllable = AC00 + (L-1100)*588 +
   (V-1161)*28 + (T-11A7). Spark's ``chr`` is mod-256 so the computed
   code point is materialized by INDEXING into an 11172-char literal
   of the contiguous syllable block (``substring(HANGUL_SYLLABLES,
   idx+1, 1)``) — the arithmetic stays in whole-stage codegen. Both
   full jamo clusters (L V [T]) and partially-composed LV-syllable +
   trailing T compose, the two forms NFC defines.
3. **Everything else**: the piece's longest prefix (4, 3, then 2
   chars — canonical decompositions are at most 4 code points) is
   looked up in a FLAT literal map of ALL canonical compositions
   Unicode defines (``map_from_arrays`` over two array literals —
   deliberately flat: a chained per-entry ``replace`` expression
   overflows Catalyst's conversion stack past ~300 entries, measured,
   while array literals are data). A hit composes the prefix and
   keeps the remaining marks; a miss passes the piece through
   verbatim — visible, never silently dropped.

The table is GENERATED from ``unicodedata`` over the full code space:
every character whose canonical decomposition round-trips
(``NFC(NFD(ch)) == ch``) except the Hangul block (algorithmic above).
That is 941 entries covering Latin-1/Extended (all Vietnamese stacked
diacritics), Greek + Greek Extended (polytonic), Cyrillic, Hebrew,
Arabic, Indic two-part vowels, kana voicing marks, and the
supplementary-plane letters — singletons and composition exclusions
(which NFC leaves decomposed) are excluded by the round-trip rule.

DOCUMENTED DOMAIN (what remains outside, by contract): input clusters
must be canonically ordered with contiguously-composing marks — i.e.
any exact NFD form (plus trailing non-composing marks after a
composed prefix). DISCONTIGUOUS composition (a non-composing mark
ordered before a composing one, e.g. e + U+0320 + U+0301, where real
NFC composes the starter with the LATER mark) passes through
verbatim; jamo runs beyond L V [T] likewise. The fixture generator's
Python twin (``nfc_compose_py``) enforces the domain at generation
time: every emitted text is asserted to normalize identically under
this algorithm, real ``unicodedata`` NFC, and (in parity) DuckDB's
utf8proc ``nfc_normalize`` — the three-implementation agreement
proof.

Scale: per-row projection, no shuffle. Already-NFC text takes the
single-char-cluster fast path (a length check); only decomposed
clusters pay map lookups (linear scan of the 941-entry literal map,
up to 3 probes — documented cost, bounded by cluster count).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- Hangul arithmetic (Unicode ch. 3.12) ---------------------------
_S_BASE, _L_BASE, _V_BASE, _T_BASE = 0xAC00, 0x1100, 0x1161, 0x11A7
_L_COUNT, _V_COUNT, _T_COUNT = 19, 21, 28
_S_COUNT = _L_COUNT * _V_COUNT * _T_COUNT  # 11172

# The contiguous precomposed syllable block, used as a chr() table
# (substring indexing) because Spark's chr is mod-256.
HANGUL_SYLLABLES = "".join(chr(_S_BASE + i) for i in range(_S_COUNT))

_RE_LVT = "^[ᄀ-ᄒ][ᅡ-ᅵ][ᆨ-ᇂ]?$"
_RE_LV_T = "^[가-힣][ᆨ-ᇂ]$"

# Cluster boundary: before any char that is neither a combining mark
# (Mn AND Mc — Indic two-part vowel components are spacing Mc marks)
# nor a V/T jamo (so a starter travels with its combining sequence,
# and L jamo travel with their V/T). The low-surrogate range is also
# excluded from boundaries: Spark's split offers match positions
# BETWEEN the UTF-16 halves of a supplementary character (measured —
# without the exclusion it cuts U+1109A in half and corrupts both
# sides to '?'), while \p{Mn} itself matches per code point.
CLUSTER_SPLIT_REGEX = r"(?=[^\p{Mn}\p{Mc}\x{1161}-\x{11FF}\x{DC00}-\x{DFFF}])"


# Oracle-version boundary (pinned by tests): Python's unicodedata here
# is Unicode 14.0 while DuckDB's utf8proc build predates Dives Akuru's
# composition data — U+11938 is the ONE code point the two reference
# implementations disagree on (enumerated by sweep, r16). It is
# excluded from the table so every remaining entry carries the full
# three-implementation agreement proof; inputs containing its NFD
# sequence pass through verbatim (visible, documented).
ORACLE_VERSION_EXCLUSIONS = frozenset({0x11938})


def _full_compose_table() -> tuple[tuple[str, str], ...]:
    """(NFD sequence -> precomposed) for every character whose
    canonical decomposition round-trips under NFC, Hangul excluded
    (algorithmic). Longest-first for deterministic ordering."""
    entries = []
    for cp in range(0x110000):
        if _S_BASE <= cp <= 0xD7A3 or cp in ORACLE_VERSION_EXCLUSIONS:
            continue
        ch = chr(cp)
        dec = unicodedata.normalize("NFD", ch)
        if dec != ch and unicodedata.normalize("NFC", dec) == ch:
            entries.append((dec, ch))
    entries.sort(key=lambda p: (-len(p[0]), p[0]))
    return tuple(entries)


NFC_COMPOSE_TABLE: tuple[tuple[str, str], ...] = _full_compose_table()

# Canonical decompositions are 2..4 code points (asserted so the
# prefix probes below stay exhaustive if Unicode data ever changes).
_MAX_KEY = max(len(d) for d, _ in NFC_COMPOSE_TABLE)
assert _MAX_KEY == 4 and min(len(d) for d, _ in NFC_COMPOSE_TABLE) == 2

# Kept for fixture/doc reporting: the composable characters.
NFC_DOMAIN = "".join(pre for _, pre in NFC_COMPOSE_TABLE)

_BIG = 2**31 - 1


def _hangul_syllable(idx: Column) -> Column:
    return F.substring(F.lit(HANGUL_SYLLABLES), idx + F.lit(1), F.lit(1))


def _cp(p: Column, i: int) -> Column:
    return F.ascii(F.substring(p, F.lit(i), F.lit(1)))


def _compose_piece(p: Column, table_map: Column) -> Column:
    """One cluster through the composition contract (module doc)."""
    lvt_idx = (
        (_cp(p, 1) - F.lit(_L_BASE)) * F.lit(_V_COUNT * _T_COUNT)
        + (_cp(p, 2) - F.lit(_V_BASE)) * F.lit(_T_COUNT)
        + F.when(F.length(p) == 3, _cp(p, 3) - F.lit(_T_BASE)).otherwise(F.lit(0))
    )
    lv_t_idx = (_cp(p, 1) - F.lit(_S_BASE)) + (_cp(p, 2) - F.lit(_T_BASE))

    def probe(at: int, k: int) -> Column:
        """Compose k chars starting at 1-based position `at`, keeping
        the untouched head and the trailing remainder. at=1 covers
        exact NFD prefixes; at=2 covers a base letter followed by a
        mark-initial key (Indic two-part vowels, whose components are
        marks with ccc=0 — real NFC composes those as starter pairs)."""
        lead = F.substring(p, F.lit(1), F.lit(at - 1)) if at > 1 else F.lit("")
        return F.concat(
            lead,
            F.try_element_at(table_map, F.substring(p, F.lit(at), F.lit(k))),
            F.substring(p, F.lit(at + k), F.lit(_BIG)),
        )

    return (
        F.when(F.length(p) < 2, p)  # fast path: already-composed text
        .when(p.rlike(_RE_LVT), _hangul_syllable(lvt_idx))
        .when(
            p.rlike(_RE_LV_T)
            & ((_cp(p, 1) - F.lit(_S_BASE)) % F.lit(_T_COUNT) == F.lit(0)),
            _hangul_syllable(lv_t_idx),
        )
        .otherwise(
            F.coalesce(
                probe(1, 4), probe(1, 3), probe(1, 2),
                probe(2, 3), probe(2, 2),
                p,
            )
        )
    )


def nfc_compose_column(col: Column | str) -> Column:
    """NFC composition as one flat codegen expression: cluster split ->
    per-cluster compose -> rejoin. No Python at runtime, no shuffle."""
    text = F.col(col) if isinstance(col, str) else col
    table_map = F.map_from_arrays(
        F.lit([d for d, _ in NFC_COMPOSE_TABLE]),
        F.lit([p for _, p in NFC_COMPOSE_TABLE]),
    )
    pieces = F.split(text, CLUSTER_SPLIT_REGEX)
    return F.array_join(
        F.transform(pieces, lambda p: _compose_piece(p, table_map)), ""
    )


# --- Python twin (generator-side domain check + tests) ---------------

_TABLE_DICT = {d: p for d, p in NFC_COMPOSE_TABLE}


def _is_boundary(ch: str) -> bool:
    if 0x1161 <= ord(ch) <= 0x11FF:
        return False
    return unicodedata.category(ch) not in ("Mn", "Mc")


def _py_clusters(s: str) -> list[str]:
    out: list[str] = []
    for ch in s:
        if out and not _is_boundary(ch):
            out[-1] += ch
        else:
            out.append(ch)
    return out


def nfc_compose_py(s: str) -> str:
    """Exact Python mirror of nfc_compose_column — the generator's
    domain check and the differential-test twin."""
    out: list[str] = []
    for p in _py_clusters(s):
        if len(p) < 2:
            out.append(p)
            continue
        cps = [ord(c) for c in p]
        if (
            len(p) in (2, 3)
            and 0x1100 <= cps[0] <= 0x1112
            and 0x1161 <= cps[1] <= 0x1175
            and (len(p) == 2 or 0x11A8 <= cps[2] <= 0x11C2)
        ):
            idx = (
                (cps[0] - _L_BASE) * _V_COUNT * _T_COUNT
                + (cps[1] - _V_BASE) * _T_COUNT
                + (cps[2] - _T_BASE if len(p) == 3 else 0)
            )
            out.append(HANGUL_SYLLABLES[idx])
            continue
        if (
            len(p) == 2
            and _S_BASE <= cps[0] <= 0xD7A3
            and 0x11A8 <= cps[1] <= 0x11C2
            and (cps[0] - _S_BASE) % _T_COUNT == 0
        ):
            out.append(HANGUL_SYLLABLES[(cps[0] - _S_BASE) + (cps[1] - _T_BASE)])
            continue
        for at, k in ((0, 4), (0, 3), (0, 2), (1, 3), (1, 2)):
            pre = _TABLE_DICT.get(p[at : at + k])
            if pre is not None:
                out.append(p[:at] + pre + p[at + k :])
                break
        else:
            out.append(p)
    return "".join(out)


# Self-check: round-trip through real NFC agrees for every entry.
for _dec, _pre in NFC_COMPOSE_TABLE:
    assert unicodedata.normalize("NFC", _dec) == _pre, (_dec, _pre)
