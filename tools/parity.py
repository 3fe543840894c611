"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their stringified tuple). Usage:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession

from parallel_map_reduce_spark.registry import all_queries
from parallel_map_reduce_spark.sources.catalog import TABLES


def _normalize(v):
    if isinstance(v, float):
        # Engines may render -0.0/0.0 differently; canonicalize.
        if v == 0:
            return "0.0"
        return repr(v)
    if v is None:
        return "<NULL>"
    return str(v)


def _driver_canon(rows: list[tuple], colnames: list[str]) -> str:
    """The driver's own canonicalization shape (CORRECTNESS gate):
    rows -> pandas DataFrame, columns sorted BY NAME, ``sort_values``
    over all columns, then a hash over the stringified frame. Kept
    deliberately pandas-based so any cell type pandas cannot factorize
    (list, dict, ndarray) raises HERE exactly as it does in the gate."""
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=colnames)
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    h = hashlib.sha256()
    for r in pdf.itertuples(index=False):
        h.update("|".join(_normalize(v) for v in r).encode())
        h.update(b"\n")
    return h.hexdigest()


def _twin_canon(rows: list[tuple]) -> list[tuple]:
    """Sorted row tuples with floats rounded to 12 dp — the
    tests/test_similarity.py twin-equality convention (columns are
    required to match positionally first, so no name sort here)."""
    return sorted(
        tuple(round(v, 12) if isinstance(v, float) else v for v in r)
        for r in rows
    )


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted("|".join(_normalize(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = all_queries()
    if only:
        specs = {k: v for k, v in specs.items() if k in only}

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # Deliberately a BARE session (like the driver's), so any conf the
    # engine needs must be applied at runtime by the engine itself.
    spark = (
        SparkSession.builder.appName("parity")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    from parallel_map_reduce_spark.registry import release_pins

    failures = []
    for name, spec in sorted(specs.items()):
        release_pins()  # free the previous query's pinned caches
        t0 = time.time()
        try:
            sdf = spec.build(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"  {name:35s} SPARK ERROR: {str(e)[:200]}")
            continue
        if spec.oracle is None:
            # Replicate the DRIVER's canonicalization even when there is
            # no oracle to compare against: the driver canonicalizes
            # rows-only results through pandas sort_values, which
            # CRASHES on unhashable cell types (list/dict from raw
            # ARRAY/MAP columns). Round 9 shipped exactly that class
            # because this path used to just count rows — a local
            # ALL-OK for a frame the driver could not even canonicalize.
            try:
                _driver_canon(srows, scols)
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                print(f"  {name:35s} CANON ERROR (driver would crash): "
                      f"{type(e).__name__}: {str(e)[:120]}")
                continue
            # Twin-identity upgrade (VERDICT r11 task 6): where an
            # independent-path twin exists, record exact row identity
            # against it instead of a bare row count. TWIN_COMPARE
            # carries the few legitimately tolerance-based comparisons
            # (float linear algebra); everything else is exact.
            from parallel_map_reduce_spark.queries.twins import (
                TWIN_COMPARE,
                TWINS,
            )

            from parallel_map_reduce_spark.queries.tolerance import (
                TOLERANCE,
            )

            if name in TOLERANCE:
                # Sketch family (VERDICT r13 task 1): no oracle (the
                # checker is exact-diff) and no independent twin
                # (re-sketching reproduces the estimate), but the
                # published error bound IS checkable — record bound +
                # observed worst error vs the exact quantity.
                label, witness = TOLERANCE[name]
                try:
                    rec = witness(spark, sf_dir, srows, scols)
                except Exception as e:  # noqa: BLE001
                    failures.append(name)
                    print(f"  {name:35s} TOLERANCE ERROR ({label}): "
                          f"{type(e).__name__}: {str(e)[:120]}")
                    continue
                if not rec["ok"]:
                    failures.append(name)
                    print(f"  {name:35s} TOLERANCE FAIL vs {label}: "
                          f"bound [{rec['bound']}] violated — "
                          f"{rec['observed']} {rec['detail']}")
                    continue
                print(f"  {name:35s} tolerance-matched: {len(srows):5d} rows "
                      f"(vs {label}) ({time.time()-t0:5.1f}s)")
                print(f"      bound [{rec['bound']}]; {rec['observed']}")
                if not srows:
                    failures.append(name)
                    print(f"    FAIL: {name} returned 0 rows")
                continue
            if name in TWINS:
                label, build_twin = TWINS[name]
                try:
                    tdf = build_twin(spark, sf_dir)
                    tcols = tdf.columns
                    trows = [tuple(r) for r in tdf.collect()]
                except Exception as e:  # noqa: BLE001
                    failures.append(name)
                    print(f"  {name:35s} TWIN ERROR ({label}): "
                          f"{type(e).__name__}: {str(e)[:120]}")
                    continue
                cmp_fn = TWIN_COMPARE.get(name)
                if cmp_fn is not None:
                    matched = tcols == scols and cmp_fn(srows, trows)
                    grade = "twin-matched (tolerance)"
                else:
                    matched = (
                        tcols == scols
                        and _twin_canon(trows) == _twin_canon(srows)
                    )
                    grade = "twin-identical"
                if not matched:
                    failures.append(name)
                    print(f"  {name:35s} TWIN MISMATCH vs {label}: "
                          f"spark={len(srows)} twin={len(trows)} rows")
                    continue
                print(f"  {name:35s} {grade}: {len(srows):7d} rows "
                      f"(vs {label}) ({time.time()-t0:5.1f}s)")
            else:
                print(f"  {name:35s} rows-only: {len(srows):7d} rows "
                      f"({time.time()-t0:5.1f}s)")
            if not srows:
                print(f"    WARNING: {name} returned 0 rows")
            continue
        try:
            rel = con.sql(spec.oracle)
            ocols = rel.columns
            orows = [tuple(r) for r in rel.fetchall()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"  {name:35s} ORACLE ERROR: {e}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        elif value_hash(srows, scols) != value_hash(orows, ocols):
            problems.append("value-hash mismatch")
        if problems:
            failures.append(name)
            print(f"  {name:35s} FAIL: {'; '.join(problems)} ({time.time()-t0:5.1f}s)")
            if "value-hash mismatch" in problems and srows and orows:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ss = sorted("|".join(_normalize(r[i]) for i in order_s) for r in srows)
                oo = sorted("|".join(_normalize(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ss, oo):
                    if a != b:
                        print(f"    spark: {a[:160]}")
                        print(f"    duck : {b[:160]}")
                        break
        else:
            print(f"  {name:35s} OK: {len(srows):7d} rows ({time.time()-t0:5.1f}s)")
            if not srows:
                print(f"    WARNING: {name} returned 0 rows")
    spark.stop()
    if failures:
        print(f"\nFAILED ({len(failures)}): {' '.join(failures)}")
        return 1
    print(f"\nALL OK ({len(specs)} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
