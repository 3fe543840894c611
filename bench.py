"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line on stdout:
    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

The driver captures only a ~2 KB TAIL of stdout (round-3 lesson: the
line grew past the buffer when per-query medians were added, and the
driver recorded ``parsed: null`` — a failed bench round despite rc=0).
So the stdout line stays SMALL: per-query best-of times only, hard
size guard at STDOUT_BUDGET bytes (drops the per-query map rather than
overflow). The full detail (best + median + every raw run) goes to
``BENCH_DETAIL.json`` next to this file, and to stderr.

Usage: python bench.py [query ...]   (default: the HEADLINE set)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from parallel_map_reduce_spark.registry import all_queries

# Headline set: one per major operator family (SURVEY.md §2), heaviest
# representative each — scan-agg, fact join, window, dedup chain, LSH,
# similarity, text, sessionization, multimodal UDF path. Rotation
# policy (round-4 lesson: grow the line and the driver drops the whole
# deliverable): when adding round-N heavies, RETIRE an equal number of
# fast, multi-round-stable micro-queries so the set size stays ~36 —
# the binding constraint is the STDOUT_BUDGET byte cap on the summary
# line (asserted with the current set in tests/test_registry_contract
# .py), and holding the set size steady keeps real headroom under it.
# Round 6: retired event_type_distinct_users (0.16 s; its salted twin
# carries the family in the gate) and top_customers_per_segment
# (0.19 s; window family benched by orders_value_deciles), squaring
# the round-5 add-9/retire-7 imbalance back to a 36-entry set.
HEADLINE = (
    "reference_corpus_index",
    "inverted_index",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "events_sessionized",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "similarity_topk_bruteforce",
    "similarity_ann_lsh",
    "text_tfidf",
    "streaming_hourly_tumbling",
    "multimodal_image_features",
    "q7_nation_trade_matrix",
    "q18_large_orders",
    "similarity_ann_ivf",
    "orders_value_deciles",
    "trade_graph_pagerank",
    "dedup_incremental_lsh",
    "search_bm25",
    "q21_waiting_suppliers",
    "neardup_triangle_census",
    "similarity_two_stage_topk",
    # round-5 rotation: new heavies in, seven <0.5 s stable micros out
    # (text_quality_scores, text_fingerprints, text_winnowing_
    # fingerprints, text_repetition_signals, event_value_quantiles,
    # funnel_view_click_purchase, curation_pipeline)
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "curation_temperature_mix",
    "similarity_two_stage_ivf_topk",
    "documents_chunked",
    # round-6 rotation: the PQ serving path and the basket-mining
    # exchange are the session's new heavies; decontaminate_benchmark_
    # overlap (0.25 s, stable r4-r6) and multimodal_video_frames
    # (0.24 s, stable since r2; the family stays benched via
    # multimodal_image_features) retire to hold the set at 36.
    "similarity_pq_topk",
    "basket_part_pairs",
    # session-2 round-6 rotation: the CDC MERGE shuffle and the Holt
    # pandas-recursion surface are the new family representatives;
    # asof_purchase_last_click (0.2 s, stable r2-r6; joins stay benched
    # via the TPC-H block) and text_bigram_counts (0.5 s, stable r3-r6;
    # text stays benched via tfidf/lm_perplexity/chunked) retire to
    # hold the set at 36.
    "orders_cdc_merge",
    "events_value_holt",
    # round-7 rotation: the composed IVFPQ serving path (VERDICT r6
    # task 1: bench must show it at or under the two_stage_ivf number),
    # the exact-substring span detector (token-stream exchange + span
    # windows) and the leakage-guarded split (5 min-label supersteps
    # over the shared edge artifact) are the round's new heavies;
    # dedup_passage_clean (0.45 s, r4-r6), q15_top_supplier (0.47 s,
    # r5-r6) and text_lm_perplexity (0.34 s, r5-r6; text stays benched
    # via tfidf / documents_chunked) retire to hold the set at 36.
    "similarity_ivfpq_topk",
    "dedup_repeated_substrings",
    "curation_leakage_split",
)

# A change to HEADLINE membership makes round-over-round totals
# non-comparable; the stdout summary and BENCH_DETAIL both carry this
# set identifier so totals are only compared within the same set
# (advisor r6: regressions must not be absorbable by silent set drift).
import hashlib as _hashlib

HEADLINE_SET_VERSION = _hashlib.md5("\n".join(HEADLINE).encode()).hexdigest()[:8]

# Hard cap on the final stdout JSON line. The driver keeps a ~2 KB tail
# of stdout; leave headroom for the trailing newline and any buffering
# slop. tests/test_registry_contract.py asserts the HEADLINE set's line
# fits with margin.
STDOUT_BUDGET = 1800


# ---------------------------------------------------------------------------
# Paired baseline measurement (VERDICT r6 task 2). Cross-window bench
# deltas on this host are noise below ~50% (BASELINE.md), so the
# flagship-vs-reference ratio is only meaningful when BOTH sides are
# timed in the SAME process window, interleaved. bench.py compiles the
# reference C++ binary (public source, /root/reference/src/tema1.cpp,
# build line per its src/Makefile), runs it on its own 355-file corpus,
# and alternates it with the repo flagship (reference_corpus_index —
# the identical workload end-to-end); the emitted ratio is
# best(flagship)/best(C++ sequential), immune to the minute-scale host
# drift that made r5→r6 totals incomparable.

REF_SRC = "/root/reference/src/tema1.cpp"
REF_MANIFEST = "/root/reference/checker/test.txt"
REF_CORPUS_BASE = "/root/reference/checker"


def _ensure_reference_binary() -> str | None:
    """Compile the reference binary once (cached by source mtime)."""
    import hashlib
    import subprocess
    import tempfile

    if not os.path.exists(REF_SRC):
        return None
    tag = hashlib.md5(
        f"{REF_SRC}:{int(os.path.getmtime(REF_SRC))}".encode()
    ).hexdigest()[:12]
    binpath = os.path.join(tempfile.gettempdir(), "pmrs_ref_bin", tag, "tema1")
    if not os.path.exists(binpath):
        os.makedirs(os.path.dirname(binpath), exist_ok=True)
        # g++ tema1.cpp -o tema1 -lpthread  (reference src/Makefile:4)
        r = subprocess.run(
            ["g++", "-O2", REF_SRC, "-o", binpath, "-lpthread"],
            capture_output=True,
        )
        if r.returncode != 0:
            print(
                f"bench: reference compile failed: {r.stderr.decode()[:300]}",
                file=sys.stderr,
            )
            return None
    return binpath


def _reference_workdir() -> str | None:
    """Scratch cwd for the binary's 26 output files, holding a manifest
    whose paths are absolute (the checker manifest is relative to the
    checker dir; the binary fopen()s paths verbatim)."""
    import tempfile

    if not os.path.exists(REF_MANIFEST):
        return None
    workdir = os.path.join(tempfile.gettempdir(), "pmrs_ref_run", str(os.getpid()))
    os.makedirs(workdir, exist_ok=True)
    with open(REF_MANIFEST) as f:
        lines = f.read().split()
    n, rels = int(lines[0]), lines[1:]
    with open(os.path.join(workdir, "manifest.txt"), "w") as f:
        f.write(f"{n}\n")
        for rel in rels:
            f.write(os.path.join(REF_CORPUS_BASE, rel) + "\n")
    return workdir


def _time_reference_binary(binpath: str, workdir: str, mappers: int, reducers: int) -> float:
    import subprocess

    t0 = time.perf_counter()
    r = subprocess.run(
        [binpath, str(mappers), str(reducers), "manifest.txt"],
        cwd=workdir,
        capture_output=True,
    )
    secs = time.perf_counter() - t0
    if r.returncode != 0:
        raise RuntimeError(f"reference binary rc={r.returncode}: {r.stderr[:200]}")
    return secs


def _paired_baseline(spark, specs, sf_dir: str) -> dict:
    """Interleave C++ reference runs with the repo flagship in one
    window; return {} if the reference toolchain/corpus is absent."""
    binpath = _ensure_reference_binary()
    workdir = _reference_workdir()
    if binpath is None or workdir is None:
        return {}
    spec = specs.get("reference_corpus_index")
    if spec is None:
        return {}
    pairs = int(os.environ.get("SPARK_GRAFT_BASELINE_PAIRS", "3"))
    cpp_seq: list[float] = []
    cpp_par: list[float] = []
    flagship: list[float] = []
    try:
        for _ in range(pairs):
            cpp_seq.append(_time_reference_binary(binpath, workdir, 1, 1))
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).count()
            flagship.append(time.perf_counter() - t0)
            cpp_par.append(_time_reference_binary(binpath, workdir, 4, 4))
    except Exception as e:  # noqa: BLE001
        print(f"bench: paired baseline ERROR: {e}", file=sys.stderr)
        return {}
    out = {
        "flagship_vs_reference_ratio": round(min(flagship) / min(cpp_seq), 3),
        "paired_flagship_runs": [round(x, 3) for x in flagship],
        "paired_cpp_seq_runs": [round(x, 3) for x in cpp_seq],
        "paired_cpp_par_runs": [round(x, 3) for x in cpp_par],
        "flagship_vs_reference_parallel_ratio": round(
            min(flagship) / min(cpp_par), 3
        ),
    }
    print(
        "bench: paired ratio (flagship/C++ seq, best-of-interleaved) "
        f"{out['flagship_vs_reference_ratio']}  flagship={out['paired_flagship_runs']} "
        f"cpp_seq={out['paired_cpp_seq_runs']} cpp_par={out['paired_cpp_par_runs']}",
        file=sys.stderr,
    )
    return out


def _mem_gb(mem: str) -> float:
    """Parse a JVM memory string ('24g', '16384m', '1t', bare bytes)
    into GiB; unrecognized values parse as 0 (advisor r7: '16384m'
    previously parsed to 0 and silently dropped the 512x notch)."""
    mem = mem.strip().lower()
    mult = {"k": 1.0 / (1024 * 1024), "m": 1.0 / 1024, "g": 1.0, "t": 1024.0}
    try:
        if mem and mem[-1] in mult:
            return float(mem[:-1]) * mult[mem[-1]]
        return float(mem) / (1024**3)  # bare bytes
    except ValueError:
        return 0.0


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = sys.argv[1:] or list(HEADLINE)

    spark = (
        SparkSession.builder.appName("bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # 24g default (box has 128 GiB): the 512x scale-curve notch
        # materializes ~512M (word, doc) posting entries through the
        # full-array inverted index, which needs >8g of executor heap in
        # local mode. Headline queries are unaffected (they fit in 8g).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Untimed warmup: absorb executor-thread spin-up, codegen compiler
    # init, and shuffle machinery into setup instead of the first query.
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()

    specs = all_queries()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    # n=3 by default: this box has 2-3x run-to-run variance, so alongside
    # best (the stable engine cost) we record the median — a regression
    # moves both, noise moves only one.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    for name in names:
        if name not in specs:
            print(f"bench: unknown query {name!r}, skipping", file=sys.stderr)
            continue
        runs: list[float] = []
        try:
            # first run pays JIT/codegen warmup; min is the stable engine
            # cost the gate compares, median the noise-aware companion.
            for _ in range(n_runs):
                t0 = time.perf_counter()
                df = specs[name].build(spark, sf_dir)
                n = df.count()  # full execution, no driver-side row transfer
                runs.append(time.perf_counter() - t0)
            best = min(runs)
            med = sorted(runs)[len(runs) // 2]
            timings[name] = round(best, 3)
            medians[name] = round(med, 3)
            all_runs[name] = [round(r, 3) for r in runs]
            print(f"bench: {name} {best:.2f}s median {med:.2f}s ({n} rows)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            medians[name] = -1.0
            all_runs[name] = []
            print(f"bench: {name} ERROR: {e}", file=sys.stderr)
        # Drop the just-benched DataFrames' refs and collect: several
        # queries localCheckpoint intermediates, whose block-manager
        # blocks are reclaimed by the ContextCleaner only once the
        # Python refs die — 100+ executions without a nudge lets dead
        # blocks accumulate against the 8g heap and degrade later
        # queries (observed: tail-of-run timings 2-3x early-run ones).
        df = None
        import gc

        gc.collect()

    # Scale curve (BENCH_DETAIL only, never stdout): the reference's own
    # 355-doc workload replicated 1x/8x/64x with distinct doc ids
    # (sources/scaled_corpus.py) through the full inverted-index
    # pipeline, ONE timed run per factor — corpus generation is a cached
    # build step outside the timed window. The C++ reference mmap-loads
    # the whole corpus (src/tema1.cpp:344-364), so ITS curve ends at
    # RAM; this one is the sub-linearity evidence BASELINE.md cites.
    # 512x (~3.3 GB of text) extends the curve past the page-cache
    # regime (VERDICT r6 task 7); generation is cached on disk across
    # runs, so only the first-ever bench pays it.
    # Tolerant env parse (advisor r7): a malformed entry (trailing
    # comma, stray space) warns and is skipped instead of killing the
    # whole bench deliverable with a ValueError.
    scale_factors = []
    for x in os.environ.get("SPARK_GRAFT_SCALE_FACTORS", "1,8,64,512").split(","):
        try:
            scale_factors.append(int(x.strip()))
        except ValueError:
            if x.strip():
                print(
                    f"bench: ignoring malformed SPARK_GRAFT_SCALE_FACTORS entry {x!r}",
                    file=sys.stderr,
                )
    scale_factors = tuple(scale_factors)
    # A JVM OOM kills the whole session (not just the query), so the
    # 512x notch only runs when the driver heap can hold its posting
    # arrays — a too-small SPARK_GRAFT_DRIVER_MEM drops it rather than
    # risking the entire bench deliverable.
    mem_gb = _mem_gb(os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    if mem_gb < 16:
        scale_factors = tuple(f for f in scale_factors if f <= 64)
    scale_curve: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SCALE_CURVE", "1") != "0" and not sys.argv[1:]:
        from parallel_map_reduce_spark.operators.inverted_index import inverted_index
        from parallel_map_reduce_spark.sources.scaled_corpus import (
            scaled_reference_corpus,
        )

        for factor in scale_factors:
            try:
                docs = scaled_reference_corpus(spark, factor)  # cached build
                t0 = time.perf_counter()
                n = inverted_index(docs).count()
                secs = time.perf_counter() - t0
                scale_curve[f"x{factor}"] = round(secs, 3)
                print(
                    f"bench: scale_curve x{factor} {secs:.2f}s ({n} words)",
                    file=sys.stderr,
                )
            except Exception as e:  # noqa: BLE001
                scale_curve[f"x{factor}"] = -1.0
                print(f"bench: scale_curve x{factor} ERROR: {e}", file=sys.stderr)

    # Second curve: exact dedup (the canonical 100 TB pre-pass) over the
    # same replicated corpus — one digest-keyed exchange whose work is
    # linear in rows (replicas are REAL duplicates the operator must
    # group, so the workload is honest: n_copies scales with the factor,
    # pair-explosion families are deliberately NOT curved this way).
    dedup_curve: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_SCALE_CURVE", "1") != "0" and not sys.argv[1:]:
        from parallel_map_reduce_spark.operators.dedup import exact_dup_groups
        from parallel_map_reduce_spark.sources.scaled_corpus import (
            scaled_reference_corpus,
        )

        for factor in scale_factors:
            try:
                docs = scaled_reference_corpus(spark, factor)  # cached build
                t0 = time.perf_counter()
                n = exact_dup_groups(docs).count()
                secs = time.perf_counter() - t0
                dedup_curve[f"x{factor}"] = round(secs, 3)
                print(
                    f"bench: dedup_curve x{factor} {secs:.2f}s ({n} groups)",
                    file=sys.stderr,
                )
            except Exception as e:  # noqa: BLE001
                dedup_curve[f"x{factor}"] = -1.0
                print(f"bench: dedup_curve x{factor} ERROR: {e}", file=sys.stderr)

    # Paired flagship-vs-reference ratio, same process window (task: the
    # only noise-immune form of the driver's 2x-of-baseline metric).
    paired: dict = {}
    if os.environ.get("SPARK_GRAFT_PAIRED_BASELINE", "1") != "0" and not sys.argv[1:]:
        paired = _paired_baseline(spark, specs, sf_dir)
    spark.stop()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    total_median = round(sum(t for t in medians.values() if t >= 0), 3)
    sf = _sf_from_dir(sf_dir)

    # Full per-query detail to a side file (and stderr) — NOT stdout.
    detail = {
        "metric": "headline_total",
        "value": total,
        "value_median": total_median,
        "unit": "sec",
        "n_runs": n_runs,
        "sf": sf,
        "set_version": HEADLINE_SET_VERSION,
        "queries": timings,
        "queries_median": medians,
        "queries_runs": all_runs,
        "reference_corpus_scale_curve": scale_curve,
        "exact_dedup_scale_curve": dedup_curve,
        **paired,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(f"bench: detail written to {detail_path}", file=sys.stderr)

    summary = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "value_median": total_median,
        "n_runs": n_runs,
        "sf": sf,
        "set_version": HEADLINE_SET_VERSION,
        "queries": timings,
    }
    if "flagship_vs_reference_ratio" in paired:
        summary["flagship_vs_reference_ratio"] = paired[
            "flagship_vs_reference_ratio"
        ]
    line = json.dumps(summary)
    if len(line) > STDOUT_BUDGET:
        # Never overflow the driver's tail capture: the compact totals
        # always parse; the per-query map lives in BENCH_DETAIL.json.
        summary.pop("queries")
        line = json.dumps(summary)
    print(line)
    return 0 if all(t >= 0 for t in timings.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
