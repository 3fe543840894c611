"""One-off ablation for the dedup_clusters CC fixpoint (r18 opt round).

Times, in one bench-conf session at sf0.1:
  - candidates: minhash_lsh_candidates -> noop
  - cc_full:    connected_components(pairs) build+materialize (bench basis)
  - the loop's round count and per-round wall (instrumented copy)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from parallel_map_reduce_spark.operators import dedup as D
from parallel_map_reduce_spark.sources.catalog import load_table


def _mat(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("ablate_cc")
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

    docs = load_table(spark, sf_dir, "documents")

    for trial in range(3):
        t0 = time.perf_counter()
        pairs = D.minhash_lsh_candidates(load_table(spark, sf_dir, "documents"))
        _mat(pairs)
        print(f"candidates[{trial}]: {time.perf_counter() - t0:.3f}s", flush=True)

    for trial in range(3):
        t0 = time.perf_counter()
        pairs = D.minhash_lsh_candidates(load_table(spark, sf_dir, "documents"))
        out = D.connected_components(pairs)
        _mat(out)
        print(f"cc_full[{trial}]: {time.perf_counter() - t0:.3f}s", flush=True)

    # instrumented copy of the loop
    pairs = D.minhash_lsh_candidates(load_table(spark, sf_dir, "documents"))
    t0 = time.perf_counter()
    sym = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    print(f"edges checkpoint: {time.perf_counter() - t0:.3f}s", flush=True)
    t0 = time.perf_counter()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    print(f"labels init: {time.perf_counter() - t0:.3f}s", flush=True)
    n_edges = edges.count()
    n_nodes = labels.count()
    print(f"n_edges={n_edges} n_nodes={n_nodes}", flush=True)
    for rnd in range(15):
        t0 = time.perf_counter()
        nbr = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.doc_id == nbr.src, "left")
            .select(
                labels.doc_id,
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_min"), F.col("label")) < F.col("label"))
                .cast("int")
                .alias("chg"),
            )
            .localCheckpoint(eager=True)
        )
        ckpt_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        changed = new_labels.agg(F.sum("chg")).first()[0]
        cnt_s = time.perf_counter() - t1
        labels = new_labels.drop("chg")
        print(
            f"round {rnd}: ckpt {ckpt_s:.3f}s count {cnt_s:.3f}s changed={changed}",
            flush=True,
        )
        if not changed:
            break
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
