"""Dump ``.explain("formatted")`` for named registry queries to files.

Optimization-round evidence capture (guide §1): writes
``plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag>.txt`` (default r18) for each named query so plan-shape
claims in OPTIMIZATION_<round>.md are diffable artifacts, not prose.

Usage: python tools/explain_dump.py <tag> [sf_dir] <query> [query ...]
    tag     "before" / "after" (file suffix)
    sf_dir  optional scale-factor dir (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_spark.registry import all_queries, release_pins


def main() -> int:
    tag = sys.argv[1]
    rest = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]
    names = rest
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r18"))
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("explain_dump")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        if name not in specs:
            print(f"unknown query {name!r}", file=sys.stderr)
            continue
        release_pins()
        try:
            df = specs[name].build(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building/explaining {name}: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
