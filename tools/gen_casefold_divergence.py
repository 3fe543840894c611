"""Generate the committed case-folding divergence fixture
(refdata/casefold_divergence.parquet) — VERDICT r15 task 3.

The unicode tokenize contract (operators/tokenize.py) lowercases with
each engine's own ``lower()``; its one remaining documented exclusion
was prose ("case-folding divergences"). This script turns the fence
into DATA: a full-code-space, three-implementation sweep — Spark/Java
``lower()`` vs DuckDB/utf8proc ``lower()`` vs Python ``str.lower()``
— recording EVERY code point where any pair disagrees, plus the one
CONTEXTUAL divergence (Java and Python apply Unicode's final-sigma
rule, ``'ΟΣ' -> 'ος'``; utf8proc maps unconditionally, ``-> 'οσ'``).

The committed fixture IS the divergence domain: the contract test
(tests/test_casefold_divergence.py) re-runs the sweep against the
live engines and asserts set equality, so an engine upgrade that
moves the boundary fails loudly instead of silently shifting the
tokenize contract.

Findings at generation time (pinned environment: OpenJDK 17 / DuckDB
utf8proc / CPython 3.11 = Unicode 14.0):

- java != utf8proc: 71 code points — utf8proc predates the mappings
  for Vithkuqi, Old Polish O / insular-Latin additions, caudate
  Glagolitic, etc.; plus U+0130 (Turkish dotted I), where utf8proc
  yields bare ``i`` while Java/Python yield ``i`` + COMBINING DOT
  ABOVE.
- java != python: 27 code points — the JDK's Unicode tables are newer
  than CPython 3.11's (e.g. U+A7CB -> U+0264).
- contextual: final sigma only.

Columns: kind ('single'|'contextual'), cp (code point, -1 for
contextual rows), ch (the char or context string), java_lower,
utf8proc_lower, python_lower.

Deterministic given the pinned engine versions. Usage:
python tools/gen_casefold_divergence.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "refdata",
    "casefold_divergence.parquet",
)

# Contextual probes for the final-sigma rule: capital sigma word-final
# after a letter, before punctuation/space, lone, and word-medial
# (medial agrees across engines; it is included to pin WHERE the rule
# fires, not just that it exists).
CONTEXT_PROBES = ["ΟΣ", "ΟΣ Β", "ΛΟΓΟΣ.", "Σ", "ΟΣΟ"]


def sweep(spark) -> list[dict]:
    from pyspark.sql import functions as F

    cps = [cp for cp in range(0x110000) if not (0xD800 <= cp <= 0xDFFF)]
    chars = [chr(c) for c in cps]

    con = duckdb.connect()
    tbl = pa.table(
        {"cp": pa.array(cps, pa.int64()), "ch": pa.array(chars, pa.string())}
    )
    duck_lo = dict(
        con.execute("SELECT cp, lower(ch) FROM tbl").fetchall()
    )

    df = spark.createDataFrame(list(zip(cps, chars)), "cp long, ch string")
    java_lo = {
        r.cp: r.lo for r in df.select("cp", F.lower("ch").alias("lo")).collect()
    }

    rows = []
    for cp in cps:
        j, d, p = java_lo[cp], duck_lo[cp], chr(cp).lower()
        if j != d or j != p or d != p:
            rows.append(
                {
                    "kind": "single",
                    "cp": cp,
                    "ch": chr(cp),
                    "java_lower": j,
                    "utf8proc_lower": d,
                    "python_lower": p,
                }
            )
    one = df.limit(1)
    for s in CONTEXT_PROBES:
        j = one.select(F.lower(F.lit(s)).alias("v")).collect()[0].v
        d = con.execute("SELECT lower(?)", [s]).fetchone()[0]
        rows.append(
            {
                "kind": "contextual",
                "cp": -1,
                "ch": s,
                "java_lower": j,
                "utf8proc_lower": d,
                "python_lower": s.lower(),
            }
        )
    return rows


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    rows = sweep(spark)
    spark.stop()
    table = pa.table(
        {
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
            "cp": pa.array([r["cp"] for r in rows], pa.int64()),
            "ch": pa.array([r["ch"] for r in rows], pa.string()),
            "java_lower": pa.array([r["java_lower"] for r in rows], pa.string()),
            "utf8proc_lower": pa.array(
                [r["utf8proc_lower"] for r in rows], pa.string()
            ),
            "python_lower": pa.array(
                [r["python_lower"] for r in rows], pa.string()
            ),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    n_jd = sum(
        1
        for r in rows
        if r["kind"] == "single" and r["java_lower"] != r["utf8proc_lower"]
    )
    print(
        f"wrote {OUT}: {table.num_rows} rows "
        f"({n_jd} java-vs-utf8proc single-char divergences)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
