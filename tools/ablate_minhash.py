"""One-off ablation for the minhash/LSH chain (r18 opt round)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from parallel_map_reduce_spark.operators import dedup as D
from parallel_map_reduce_spark.functions.hashing import md5_i32
from parallel_map_reduce_spark.sources.catalog import load_table


def _mat(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("ablate_minhash")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()

    def docs():
        return load_table(spark, sf_dir, "documents")

    stages = {
        "tokenize_only": lambda: D.clean_words_array(docs()).select(
            "doc_id", F.size("words").alias("n")
        ),
        "shingles_explode": lambda: D.doc_shingles(docs()),
        "shingles_md5": lambda: D.doc_shingles(docs()).withColumn(
            "hv", md5_i32("shingle")
        ),
        "minhash_wide": lambda: D._minhash_wide(docs()),
        "band_sigs": lambda: D.lsh_band_signatures(docs()),
        "candidates": lambda: D.minhash_lsh_candidates(docs()),
    }
    n = docs().count()
    n_sh = D.doc_shingles(docs()).count()
    print(f"docs={n} shingle_rows={n_sh}", flush=True)
    for name, fn in stages.items():
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            _mat(fn())
            runs.append(time.perf_counter() - t0)
        print(f"{name:18s} best {min(runs):.3f}s runs {[round(r,3) for r in runs]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
