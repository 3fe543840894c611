"""RFC 9309 robots.txt exclusion — the crawl chain's politeness step
(WARC ingest -> URL canon -> frontier -> ROBOTS FILTER -> fetch).

From-spec implementation of the Robots Exclusion Protocol (RFC 9309):

* **Parsing** (§2.2): a file is a sequence of ``directive: value``
  lines; ``#`` starts a comment; directive names are case-insensitive;
  unknown directives (``crawl-delay``, ``sitemap``, ...) are ignored
  for matching. Consecutive ``User-agent`` lines open ONE group whose
  rules are the following ``Allow``/``Disallow`` lines; a
  ``User-agent`` line after a rule line starts a NEW group. Rules
  before any ``User-agent`` line belong to no group and never apply.
* **Group selection** (§2.2.1): a crawler obeys the union of every
  group naming its product token (case-insensitive exact match); only
  when NO group names it do the ``*`` groups apply; with neither, the
  whole host is allowed. A matching group with no rules allows
  everything (it still suppresses the ``*`` groups).
* **Matching** (§2.2.2): a rule path matches as a prefix of the URL
  path; ``*`` matches any span; ``$`` at the END anchors the match to
  the end of the path ('$' elsewhere is literal). An empty rule value
  matches nothing. Path comparison is case-SENSITIVE.
* **Precedence** (§2.2.2): the matching rule with the most octets
  wins; on a tie, ``Allow`` wins. No rule matches -> allowed.

Spark side: pure DataFrame ops — line posexplode + one window per
host for group assembly (robots bodies are small; the shuffle key is
``host``, exactly the co-location a 100 TB crawl wants), then a
host-keyed rules join and one winner aggregation. The wildcard
matcher is a codegen ``aggregate`` fold over the pattern's
``*``-separated segments (leftmost placement; the ``$`` anchor is the
end-occurrence check, valid because the fold's leftmost position is a
lower bound for the end occurrence) — NO per-row regex compilation
and no Python at runtime.

The Python twin (``robots_allowed_py``) mirrors the contract exactly
for the fixture generator's composition asserts and differential
tests; the DuckDB oracle re-derives the whole contract a THIRD way
(dynamic RE2 patterns built from the rule text) in
``queries/warc_ingest.py:crawl_robots_filter``.

Reference parity note: the reference engine (src/tema1.cpp) has no
crawl operators — this is LLM-pipeline surface, not §2.1 parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DIRECTIVE_RE = r"^([A-Za-z][A-Za-z-]*)\s*:"
_VALUE_RE = r"^[A-Za-z][A-Za-z-]*\s*:\s*(.*?)\s*$"


def parse_robots_rules(
    robots: DataFrame, agent: str, host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) -> the rules applicable to ``agent``:
    ``host, pattern, is_allow, spec`` (spec = pattern length, the
    precedence key). Hosts with no applicable rules emit nothing —
    the match step's left join defaults them to allowed.

    One window + two aggregations, all keyed by host.
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias(
            "line_no", "raw"
        ),
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "line_no",
        F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1)).alias("dir"),
        F.regexp_extract("line", _VALUE_RE, 1).alias("val"),
    ).filter(F.col("dir").isin("user-agent", "allow", "disallow"))

    from ..registry import pin

    w = Window.partitionBy("host").orderBy("line_no")
    # pin(): grouped feeds the rules rows AND the agents aggregation
    # (which itself feeds the group flags and the host flag) — without
    # it each reference re-expands the scan -> parse -> double-window
    # subplan (plan audit showed the parse tree expanded three times).
    grouped = pin(
        parsed.withColumn(
            "gid",
            F.sum(
                F.when(
                    (F.col("dir") == "user-agent")
                    & (
                        F.coalesce(F.lag("dir").over(w), F.lit(""))
                        != "user-agent"
                    ),
                    1,
                ).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )

    agents = pin(
        grouped.filter(F.col("dir") == "user-agent")
        .groupBy("host", "gid")
        .agg(
            F.max(
                F.lower(F.col("val")) == F.lit(agent.lower())
            ).alias("named"),
            F.max(F.col("val") == "*").alias("star"),
        )
    )
    # Host-level flag from the GROUPS (a named group with zero rules
    # still suppresses the * groups).
    host_flag = agents.groupBy("host").agg(
        F.max("named").alias("has_named")
    )
    rules = (
        grouped.filter(
            F.col("dir").isin("allow", "disallow") & (F.col("val") != "")
        )
        .join(agents, ["host", "gid"])
        .join(host_flag, "host")
        .filter(
            F.when(F.col("has_named"), F.col("named")).otherwise(
                F.col("star")
            )
        )
    )
    return rules.select(
        "host",
        F.col("val").alias("pattern"),
        (F.col("dir") == "allow").alias("is_allow"),
        F.length("val").alias("spec"),
    )


def robots_pattern_match(path: Column, pattern: Column) -> Column:
    """RFC 9309 §2.2.2 wildcard match as a codegen fold (module doc).

    Empty segments (from ``**`` or a trailing ``*``) are skipped —
    they match at the current position without advancing (Spark's
    ``locate('' ...)`` returns 1 unconditionally, so the guard is
    required, measured).
    """
    ea = F.endswith(pattern, F.lit("$"))
    pat = F.when(
        ea, F.substring(pattern, F.lit(1), F.length(pattern) - F.lit(1))
    ).otherwise(pattern)
    segs = F.split(pat, r"\*", -1)
    first = F.element_at(segs, 1)
    rest = F.slice(
        segs, F.lit(2), F.greatest(F.size(segs) - F.lit(1), F.lit(0))
    )
    init = F.struct(
        F.length(first).alias("pos"),
        F.startswith(path, first).alias("ok"),
    )
    folded = F.aggregate(
        rest,
        init,
        lambda acc, seg: F.when(F.length(seg) == 0, acc).otherwise(
            F.struct(
                (
                    F.call_function("locate", seg, path, acc["pos"] + 1)
                    + F.length(seg)
                    - 1
                ).alias("pos"),
                (
                    acc["ok"]
                    & (
                        F.call_function("locate", seg, path, acc["pos"] + 1)
                        > 0
                    )
                ).alias("ok"),
            )
        ),
    )
    # End anchor: with >=2 segments a '*' directly precedes the last
    # one, so "last segment occurs at the very end" suffices (the
    # fold's leftmost position lower-bounds the end occurrence); with
    # ONE segment there is no wildcard to span the gap, so the match
    # must be exact equality (prefix + equal length).
    last = F.element_at(segs, F.size(segs))
    end_ok = F.when(
        F.size(segs) == 1, F.length(path) == F.length(pat)
    ).otherwise(F.endswith(path, last))
    return folded["ok"] & (~ea | end_ok)


def robots_verdicts(
    urls: DataFrame, rules: DataFrame, path_col: str = "path"
) -> DataFrame:
    """Per-URL verdict: every column of ``urls`` plus ``allowed``,
    ``matched_rule`` (NULL when no rule matched), ``rule_len``.

    Host-keyed join (rule fan-out per URL is the host's rule count —
    robots files are small by construction), then one winner
    aggregation: max (spec, is_allow, pattern) struct = most-specific
    rule, Allow on ties, lexicographic-max pattern as the
    deterministic witness among equal-length same-type rules.
    """
    key_cols = [c for c in urls.columns]
    joined = urls.join(rules, "host", "left").withColumn(
        "hit",
        F.when(
            F.col("pattern").isNotNull()
            & robots_pattern_match(F.col(path_col), F.col("pattern")),
            F.struct("spec", "is_allow", "pattern"),
        ),
    )
    return joined.groupBy(*key_cols).agg(
        F.coalesce(F.max("hit")["is_allow"], F.lit(True)).alias("allowed"),
        F.max("hit")["pattern"].alias("matched_rule"),
        F.max("hit")["spec"].alias("rule_len"),
    )


_RULES_ARRAY = "array<struct<spec:int,is_allow:boolean,pattern:string>>"


def robots_rules_by_host(rules: DataFrame) -> DataFrame:
    """``host -> array<(spec, is_allow, pattern)>`` — the SERVING
    shape: one row per host (bytes-bounded by the protocol's 500 KiB
    file cap), so verdicts become a stateless per-row fold."""
    return rules.groupBy("host").agg(
        F.collect_list(F.struct("spec", "is_allow", "pattern")).alias(
            "rules"
        )
    )


def robots_verdicts_folded(
    urls: DataFrame, rules_by_host: DataFrame, path_col: str = "path"
) -> DataFrame:
    """Per-URL verdict as ONE host-keyed join + a per-row array fold —
    no row fan-out, no winner shuffle, no state: filter the host's
    rule array by the wildcard matcher, ``array_max`` picks the
    (octets, Allow-wins, pattern) winner in-row. The same columns as
    ``robots_verdicts`` (which stays as the fan-out+aggregate twin,
    differentially tested equal); this shape is also the streaming
    one — a stream-static join plus a stateless projection, so the
    politeness filter adds ZERO streaming state."""
    path = F.col(path_col)
    hit = F.array_max(
        F.filter(
            F.coalesce(F.col("rules"), F.array().cast(_RULES_ARRAY)),
            lambda r: robots_pattern_match(path, r["pattern"]),
        )
    )
    return urls.join(rules_by_host, "host", "left").select(
        *urls.columns,
        F.coalesce(hit["is_allow"], F.lit(True)).alias("allowed"),
        hit["pattern"].alias("matched_rule"),
        hit["spec"].alias("rule_len"),
    )


# --- Python twin (fixture composition asserts + differential tests) --


def _parse_robots_py(body: str, agent: str):
    agent = agent.lower()
    groups: list[tuple[set[str], list[tuple[str, bool]]]] = []
    in_ua = False
    for raw in body.replace("\r\n", "\n").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        name, _, val = line.partition(":")
        name, val = name.strip().lower(), val.strip()
        if not name or not all(c.isalpha() or c == "-" for c in name):
            continue
        if name == "user-agent":
            if not in_ua:
                groups.append((set(), []))
                in_ua = True
            groups[-1][0].add(val.lower())
        elif name in ("allow", "disallow"):
            # An empty value is a rule LINE (it ends the user-agent
            # run) that matches nothing.
            in_ua = False
            if groups and val:
                groups[-1][1].append((val, name == "allow"))
        # Unknown directives (crawl-delay, sitemap, ...) are ignored
        # entirely — RFC 9309 §2.2.4: other records MUST NOT
        # interrupt a group, so they do NOT end a user-agent run.
    named = [g for g in groups if agent in g[0]]
    chosen = named if named else [g for g in groups if "*" in g[0]]
    return [r for g in chosen for r in g[1]]


def _match_py(path: str, pattern: str) -> bool:
    ea = pattern.endswith("$")
    if ea:
        pattern = pattern[:-1]
    segs = pattern.split("*")
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    for seg in segs[1:]:
        if not seg:
            continue
        p = path.find(seg, pos)
        if p < 0:
            return False
        pos = p + len(seg)
    if not ea:
        return True
    # No wildcard -> the anchor demands exact equality; otherwise a
    # '*' precedes the last segment, so end-occurrence suffices.
    return path == pattern if len(segs) == 1 else path.endswith(segs[-1])


def robots_allowed_py(
    body: str, agent: str, path: str
) -> tuple[bool, str | None, int | None]:
    """(allowed, matched_rule, rule_len) — the exact twin of
    parse_robots_rules + robots_verdicts."""
    hits = [
        (len(p), allow, p)
        for p, allow in _parse_robots_py(body, agent)
        if _match_py(path, p)
    ]
    if not hits:
        return True, None, None
    spec, allow, pat = max(hits)
    return allow, pat, spec
