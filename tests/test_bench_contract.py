"""Bench-methodology contract (VERDICT r8 task 1).

Rounds 1-8 timed every headline query with ``.count()`` under the
comment "full execution". That was false in the plan sense: Catalyst
prunes columns a count never references, so the flagship's terminal
``collect_list``/``sort_array`` payload was absent from the optimized
count plan — the timed window did not contain the work the numbers
were attributed to. These tests pin BOTH facts permanently:

1. the pruning is real (a count-shaped plan over the inverted index
   drops collect_list — if a future Spark version stops pruning, the
   assertion documents that the old basis would have been fine);
2. bench.py never times a ``.count()`` again: every
   ``time.perf_counter()`` window in the file materializes through the
   noop sink (all columns consumed) or a real write.
"""

from __future__ import annotations

import inspect
import re

from pyspark.sql import functions as F

import bench
from parallel_map_reduce_spark.operators.inverted_index import inverted_index


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"), F.col("text")
    )


def test_count_plan_prunes_terminal_payload(spark, sf_dir):
    """The judge's r8 probe, pinned: the optimized plan of
    count(inverted_index(docs)) contains neither collect_list nor
    sort_array — counting is NOT full execution of this query."""
    idx = inverted_index(_docs(spark, sf_dir))
    count_plan = (
        idx.groupBy()
        .count()
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "collect_list" not in count_plan, (
        "Catalyst no longer prunes aggregate payload under count(); "
        "the .count() basis would be full execution again — update "
        "bench.py's basis notes if acting on this"
    )
    # The full-output plan retains the payload (what the noop write
    # executes: a v2 write consumes every column, nothing is prunable).
    full_plan = idx._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" in full_plan
    assert "sort_array" in full_plan


def test_noop_materialization_executes_full_plan(spark, sf_dir):
    """_materialize must run end-to-end (noop sink: no output path, no
    driver transfer) and raise on a genuinely failing plan — a silent
    no-op would time nothing."""
    import pytest

    idx = inverted_index(_docs(spark, sf_dir))
    bench._materialize(idx)  # executes; any failure propagates
    bad = idx.withColumn("boom", F.raise_error(F.lit("forced")))
    with pytest.raises(Exception, match="forced"):
        bench._materialize(bad)


def test_no_timed_window_in_bench_uses_count():
    """Extract every `t0 = time.perf_counter()` ... `- t0` window from
    bench.py's source and assert none calls .count() — the pruning
    defect cannot silently return. The paired-baseline flagship side
    must run the end-to-end job (format + 26-way letter write), and the
    headline loop must go through _materialize."""
    src = inspect.getsource(bench)
    windows = re.findall(
        r"t0 = time\.perf_counter\(\)(.*?)time\.perf_counter\(\) - t0",
        src,
        re.S,
    )
    assert windows, "expected timed windows in bench.py"
    for w in windows:
        assert ".count()" not in w, f"timed window uses .count():\n{w}"
    assert "_materialize(" in inspect.getsource(bench.main)
    e2e = inspect.getsource(bench._flagship_e2e)
    assert "format_index_rows" in e2e and 'partitionBy("letter")' in e2e
    for fn in (bench._paired_baseline, bench._paired_baseline_scaled):
        assert "_flagship_e2e(" in inspect.getsource(fn)


def test_set_version_carries_measurement_basis():
    """Totals are only comparable within one (HEADLINE, basis) pair;
    the basis string must participate in the set-version hash so the
    r9 re-basing shows up as a version change, not a silent regression
    or win."""
    import hashlib

    expected = hashlib.md5(
        ("\n".join(bench.HEADLINE) + "|basis=" + bench.BENCH_BASIS).encode()
    ).hexdigest()[:8]
    assert bench.HEADLINE_SET_VERSION == expected
    assert bench.BENCH_BASIS == "noop-sink-e2e"


def test_revive_rebuilds_a_dead_jvm_session():
    """The first honest-basis bench run lost every section downstream
    of one executor OOM (local mode: one JVM). _revive must hand back a
    working session after the JVM dies. Runs in a subprocess so the
    deliberate JVM kill cannot touch the shared test session."""
    import subprocess
    import sys as _sys

    code = """
import sys
sys.path.insert(0, {repo!r})
import bench
spark = bench._make_session('2')
assert bench._revive(spark, '2') is spark  # live session passes through
try:
    spark.sparkContext._jvm.java.lang.System.exit(1)
except Exception:
    pass
spark2 = bench._revive(spark, '2')
assert spark2 is not spark
assert spark2.range(5).count() == 5
bench._materialize(spark2.range(3))
spark2.stop()
print('REVIVED_OK')
""".format(repo=__import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
    r = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, timeout=240, text=True
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "REVIVED_OK" in r.stdout


def test_every_bench_section_passes_through_revive():
    """Each section boundary in main() must probe the session so one
    dead notch costs one ERROR entry, not the whole deliverable."""
    src = inspect.getsource(bench.main)
    assert src.count("_revive(spark, cpus)") >= 6


def test_contention_probe_is_fixed_work_and_recorded():
    """The host-contention probe must be deterministic fixed work (no
    data/env dependence) and every committed BENCH_DETAIL must carry
    the probe series — the interpretation key for cross-window deltas
    on this 2-4x-noisy host."""
    import inspect

    import bench

    p = bench._contention_probe()
    assert 0 < p < 30  # sane even under extreme contention
    src = inspect.getsource(bench.main)
    assert src.count("_contention_probe()") >= 4 and src.count("_contention_probe_parallel()") >= 4 and src.count("_spark_probe(") >= 3, (
        "main() must probe at section boundaries (start/headline/"
        "curves/end)"
    )
    assert '"host_probe_s": probes' in src


def test_probes_quiet_thresholds():
    """The quiet gate applies BOTH thresholds to EVERY reading."""
    q = {"par": 0.3, "spark": 0.6}
    hot_par = {"par": 5.0, "spark": 0.6}
    hot_spark = {"par": 0.3, "spark": 4.1}
    assert bench._probes_quiet(q, q)
    assert not bench._probes_quiet(q, hot_par)
    assert not bench._probes_quiet(hot_spark, q)


def test_probe_gated_notch_retries_hot_windows(spark, monkeypatch):
    """A hot window must earn a retry batch; the committed value is the
    min over ALL runs and the detail records every window's probes."""
    calls = {"n": 0}

    def fake_probes(_spark):
        calls["n"] += 1
        # First window reads hot (probe call pairs 1+2), second quiet.
        hot = calls["n"] <= 2
        return {"par": 5.0 if hot else 0.2, "spark": 0.5}

    monkeypatch.setattr(bench, "_window_probes", fake_probes)
    monkeypatch.setattr(bench, "_PAIR_BACKOFF_S", 0.0)
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.range(10)

    secs, detail = bench._probe_gated_notch(spark, build, "test-notch")
    assert secs > 0
    assert len(detail["windows"]) == 2, "hot first window must retry"
    assert detail["windows"][0]["quiet"] is False
    assert detail["windows"][1]["quiet"] is True
    assert detail["quiet"] is True
    assert builds["n"] == 2 * bench._CURVE_RUNS


def test_paired_summary_keys_fit_stdout_budget():
    """The stdout line with every r11 paired/probe key present must
    still fit the driver's tail-capture budget."""
    import json

    summary = {
        "metric": "headline_total",
        "value": 50.336,
        "unit": "sec",
        "value_median": 54.886,
        "n_runs": 3,
        "sf": 0.1,
        "set_version": bench.HEADLINE_SET_VERSION,
        "probe_par_max": 0.737,
        "probe_spark_max": 0.929,
        "queries": {name: 3.016 for name in bench.HEADLINE},
        "flagship_vs_reference_ratio": 1.656,
        "paired_quiet": True,
        "paired_discarded": 0,
        "paired_x8_quiet": True,
        "paired_x32_quiet": True,
        "paired_x64_quiet": True,
        "flagship_vs_reference_ratio_x8": 0.259,
        "flagship_vs_reference_ratio_x32": 0.137,
        "flagship_vs_reference_parallel_ratio_x8": 0.847,
        "flagship_vs_reference_parallel_ratio_x32": 0.463,
        "flagship_vs_reference_parallel_ratio_x64": 0.463,
        "flagship_vs_reference_ratio_x64": 0.137,
    }
    assert len(json.dumps(summary)) <= bench.STDOUT_BUDGET
