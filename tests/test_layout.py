"""Z-order layout: the clustering must actually buy multi-dim pruning.

A file layout is only worth a rewrite if it shrinks per-file min/max
spans on the dimensions queries filter by. This measures exactly that:
partition the events table 16 ways under (a) time-sorted layout and
(b) Z-order layout, and compare the average per-partition span of
user_id. Time-sort gives every partition the FULL user range (span ratio
~1); the Z-curve must cut it by at least half while keeping time spans
bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from parallel_map_reduce_spark.operators.layout import events_zvalues, zorder_layout
from parallel_map_reduce_spark.sources.catalog import load_table

N_PARTS = 16


def _avg_span(df, col):
    spans = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max(col) - F.min(col)).alias("span"))
    )
    row = spans.agg(F.avg("span").alias("a")).first()
    return float(row["a"])


def test_zorder_shrinks_user_span(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")

    time_layout = e.repartitionByRange(N_PARTS, "ts").sortWithinPartitions("ts")
    z_layout = zorder_layout(e, n_files=N_PARTS)

    user_span_time = _avg_span(time_layout, "user_id")
    user_span_z = _avg_span(z_layout, "user_id")
    # Z-order must at least halve the per-partition user_id span the
    # time-sorted layout leaves at ~full range.
    assert user_span_z < 0.5 * user_span_time, (user_span_z, user_span_time)


def test_zvalue_bit_roundtrip(spark, sf_dir):
    """Morton interleave must be invertible: de-interleaving the even/odd
    bits recovers the inputs exactly (proves disjoint bit placement)."""
    z = events_zvalues(load_table(spark, sf_dir, "events"))
    even = sum(
        (F.shiftright("zvalue", 2 * i).bitwiseAND(F.lit(1)) * (1 << i) for i in range(16)),
        start=F.lit(0),
    )
    odd = sum(
        (F.shiftright("zvalue", 2 * i + 1).bitwiseAND(F.lit(1)) * (1 << i) for i in range(16)),
        start=F.lit(0),
    )
    bad = z.filter(
        (even.cast("bigint") != F.col("user_bits"))
        | (odd.cast("bigint") != F.col("minute_bits"))
    ).count()
    assert bad == 0


def test_compact_parquet_reduces_files_preserves_content(spark, sf_dir, tmp_path):
    from parallel_map_reduce_spark.operators.layout import compact_parquet
    from parallel_map_reduce_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    shattered = str(tmp_path / "shattered")
    docs.repartition(32).write.parquet(shattered)
    n_in = len([f for f in __import__("os").listdir(shattered) if f.endswith(".parquet")])
    assert n_in >= 30  # genuinely shattered

    compacted = str(tmp_path / "compacted")
    compact_parquet(spark, shattered, compacted, target_file_bytes=1 << 20)
    import os

    n_out = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    assert n_out < n_in / 4, (n_in, n_out)

    back = spark.read.parquet(compacted)
    assert back.count() == docs.count()
    assert back.exceptAll(docs).isEmpty() and docs.exceptAll(back).isEmpty()


def test_range_sorted_parquet_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """Footer min/max of the written files must cover disjoint value
    ranges (the property file pruning depends on), rows must roundtrip
    exactly, and a selective range predicate must prune files at
    listing/stats time."""
    import pyarrow.parquet as pq

    from parallel_map_reduce_spark.operators.layout import range_sorted_parquet
    from parallel_map_reduce_spark.sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = str(tmp_path / "orders_sorted")
    n = range_sorted_parquet(orders, "o_totalprice", out, n_files=8)
    assert n >= 4  # range partitioner may merge tiny tails
    import os

    ranges = []
    total = 0
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet") or f.startswith("_"):
            continue
        md = pq.ParquetFile(os.path.join(out, f))
        lo = min(
            md.metadata.row_group(i).column(1).statistics.min
            for i in range(md.metadata.num_row_groups)
        )
        hi = max(
            md.metadata.row_group(i).column(1).statistics.max
            for i in range(md.metadata.num_row_groups)
        )
        total += md.metadata.num_rows
        ranges.append((lo, hi))
    assert total == orders.count()
    ranges.sort()
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 <= l2, f"overlapping file ranges ({h1} > {l2})"
    back = spark.read.parquet(out)
    assert sorted(r.o_orderkey for r in back.collect()) == sorted(
        r.o_orderkey for r in orders.collect()
    )


def test_parquet_aggregate_pushdown_capability(spark, sf_dir, tmp_path):
    """With spark.sql.parquet.aggregatePushdown on, MIN/MAX/COUNT over a
    plain parquet scan resolve from footer statistics — the scan node
    advertises PushedAggregation and never materializes data rows. A
    100 TB table answers these in metadata time; demonstrated scoped
    (conf restored after) because the default plan shape is pinned
    elsewhere."""
    from parallel_map_reduce_spark.sources.catalog import load_table

    src = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    path = str(tmp_path / "orders_plain")
    src.write.mode("overwrite").parquet(path)
    old_push = spark.conf.get("spark.sql.parquet.aggregatePushdown", "false")
    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    try:
        # pushdown is a DSv2 feature; parquet defaults to the V1 path
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet(path).agg(
            F.min("o_orderkey"), F.max("o_orderkey"), F.count("*")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [MIN(o_orderkey), MAX(o_orderkey), COUNT(*)]" in plan
        [row] = df.collect()
        exp = src.agg(F.min("o_orderkey"), F.max("o_orderkey"), F.count("*")).collect()[0]
        assert tuple(row) == tuple(exp)
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", old_push)
        if old_v1 is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)


def test_bucketed_join_elides_both_exchanges(spark, sf_dir, tmp_path):
    """Two tables bucketed on their join key with matching bucket
    counts must sort-merge join with ZERO Exchange in the plan — the
    write-time shuffle replaces both query-time shuffles. Also pins
    value equality against the plain (shuffling) join, so the layout
    is an optimization, never a semantics change."""
    from parallel_map_reduce_spark.operators.layout import (
        bucketed_equijoin,
        write_bucketed,
    )
    from parallel_map_reduce_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "t_bkt_orders", "o_orderkey", path=str(tmp_path / "o"))
    write_bucketed(li, "t_bkt_lineitem", "l_orderkey", path=str(tmp_path / "l"))
    try:
        j = bucketed_equijoin(
            spark, "t_bkt_orders", "t_bkt_lineitem", "o_orderkey", "l_orderkey"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        got = sorted(
            (r.o_orderkey, r.l_orderkey, r.o_orderpriority, r.l_quantity)
            for r in j.collect()
        )
        exp = sorted(
            (r.o_orderkey, r.l_orderkey, r.o_orderpriority, r.l_quantity)
            for r in o.join(li, o.o_orderkey == li.l_orderkey).collect()
        )
        assert got == exp and len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
        spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """Hive-partitioned fact joined to a filtered dim must plan a
    dynamicpruning subquery on the fact scan: the dim filter's
    surviving keys prune fact PARTITIONS at runtime — on a 100 TB
    fact laid out by join/filter key, the scan reads only the joined
    slice, without the query author writing the partition predicate.
    Pins both the plan marker and value equality vs the unpartitioned
    join."""
    from parallel_map_reduce_spark.sources.catalog import load_table

    path = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    ev.write.partitionBy("event_type").parquet(path)
    fact = spark.read.parquet(path)
    # The dim filter must NOT be a literal predicate on the join key —
    # that case is handled statically (constraint propagation pushes
    # `event_type = X` straight into the fact scan, no DPP needed, as
    # this test originally discovered). A filter on a computed column
    # leaves the surviving key set unknowable until runtime, which is
    # precisely what dynamic partition pruning exists for.
    dim = (
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .filter(F.length("event_type") >= 6)
    )
    j = fact.join(dim, "event_type")
    optimized = j._jdf.queryExecution().optimizedPlan().toString()
    executed = j._jdf.queryExecution().executedPlan().toString()
    assert (
        "dynamicpruning" in optimized.lower()
        or "dynamicpruningexpression" in executed.lower()
    ), "no dynamic partition pruning in plan"
    got = j.count()
    exp = ev.filter(F.length("event_type") >= 6).count()
    assert got == exp > 0


def test_runtime_bloom_filter_prunes_shuffle_join_probe(spark, sf_dir):
    """DPP's sibling for UNPARTITIONED facts: a shuffle join against a
    selectively-filtered dim should inject a runtime bloom filter
    (might_contain over a bloom_filter_agg scalar subquery) on the
    fact side, discarding non-joining rows BEFORE the exchange — at
    100 TB that is the difference between shuffling the whole fact and
    shuffling the joined slice. Conf-scoped: the application-side size
    threshold defaults to 10 GB, far above test data (same
    demonstrated-capability pattern as the aggregate-pushdown test);
    broadcast is disabled so the join actually shuffles. Pins the plan
    marker and value equality against the default-conf join."""
    from parallel_map_reduce_spark.sources.catalog import load_table

    fact = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    dim = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .filter(F.length("o_orderpriority") >= 8)
    )
    j = fact.join(dim, fact.l_orderkey == dim.o_orderkey)
    expected = j.count()

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        j2 = fact.join(dim, fact.l_orderkey == dim.o_orderkey)
        optimized = j2._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "might_contain" in optimized, "no runtime bloom filter injected"
        assert j2.count() == expected > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ensure_bucketed_table_handles_empty_build(spark, tmp_path):
    """Review finding (r8): an EMPTY bucketed build writes zero parquet
    files, so read-time schema inference would fail forever on the
    published artifact. The _SCHEMA sidecar (written from the build
    DataFrame's own schema) must make the empty table registrable and
    queryable — an LSH edge set with no candidate pairs is a legitimate
    corpus outcome, not an error."""
    from pyspark.sql import functions as F

    from parallel_map_reduce_spark.operators.layout import ensure_bucketed_table

    empty = (
        spark.range(1)
        .filter(F.col("id") < 0)
        .select(
            F.col("id").cast("string").alias("src"),
            F.col("id").cast("string").alias("dst"),
            F.col("id").alias("deg"),
        )
    )
    name = ensure_bucketed_table(
        spark, "pmrs_test_empty", "pmrs_test_bucketed_empty", "k0", lambda: empty, "src", 4
    )
    try:
        t = spark.table(name)
        assert t.count() == 0
        assert [f.name for f in t.schema.fields] == ["src", "dst", "deg"]
        # a second session-equivalent registration path: drop the
        # catalog entry and re-register from the cached artifact
        spark.sql(f"DROP TABLE `{name}`")
        name2 = ensure_bucketed_table(
            spark, "pmrs_test_empty", "pmrs_test_bucketed_empty", "k0",
            lambda: (_ for _ in ()).throw(AssertionError("must not rebuild")),
            "src", 4,
        )
        assert spark.table(name2).count() == 0
    finally:
        import shutil

        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        shutil.rmtree("/tmp/pmrs_test_bucketed_empty", ignore_errors=True)


def test_bucketed_table_rebuilds_after_artifact_eviction(spark, sf_dir, tmp_path):
    """Advisor r10: a registered serving table whose backing artifact
    the family LRU evicted must NOT be returned dangling — the missing
    _BUILT marker is the eviction signal, and the serving hit must drop
    the stale registration and rebuild through ensure_artifact."""
    import shutil

    from parallel_map_reduce_spark.operators.layout import ensure_bucketed_table
    from parallel_map_reduce_spark.sources.artifact_cache import artifact_path

    family, key = "pmrs_test_evict", "cafe0123beef"
    builds = []

    def build_df():
        builds.append(1)
        return spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )

    try:
        t1 = ensure_bucketed_table(
            spark, "t_evict_demo", family, key, build_df, "k", n_buckets=4
        )
        assert spark.table(t1).count() == 100 and builds == [1]
        # Serving hit with the artifact intact: no rebuild.
        assert ensure_bucketed_table(
            spark, "t_evict_demo", family, key, build_df, "k", n_buckets=4
        ) == t1 and builds == [1]
        # Simulate LRU eviction of the backing files.
        shutil.rmtree(artifact_path(family, key))
        t2 = ensure_bucketed_table(
            spark, "t_evict_demo", family, key, build_df, "k", n_buckets=4
        )
        assert builds == [1, 1], "eviction must trigger a rebuild"
        assert spark.table(t2).count() == 100, "rebuilt table must serve"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_evict_demo_" + key)
        shutil.rmtree(artifact_path(family, key), ignore_errors=True)
        shutil.rmtree(artifact_path(family, ""), ignore_errors=True)


def _mk_bands(spark, lo, hi):
    """Synthetic band rows (doc_id, band, sig) for promote-chain tests:
    sig collides across docs (doc_id % 7) so every bucket is non-empty."""
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("int").alias("band"),
            F.format_string("s%d", F.col("id") % 7).alias("sig"),
        )
    )


def test_promote_chain_32_autocompacts_and_stays_identical(spark):
    """VERDICT r13 task 3: a 32-promotion chain with the file-count
    compaction policy enabled must (a) trigger compaction (file counts
    fold back), (b) keep every bucket at or under the threshold in
    every PUBLISHED version, (c) never copy corpus bytes (zero link
    fallbacks on a same-filesystem cache), and (d) end row-identical
    to the from-scratch union."""
    import os

    from parallel_map_reduce_spark.operators.layout import (
        ensure_bucketed_append,
        ensure_bucketed_table,
        pop_link_fallbacks,
    )
    from parallel_map_reduce_spark.sources.artifact_cache import artifact_path

    n_buckets = 4
    threshold = 4
    run = f"c32p{os.getpid()}"
    ensure_bucketed_table(
        spark, "pmrs_chain32_v0", "pmrs_chain32", f"{run}v0",
        lambda: _mk_bands(spark, 0, 50), "sig", n_buckets,
    )
    pop_link_fallbacks()
    prev_dir = artifact_path("pmrs_chain32", f"{run}v0")
    table = "pmrs_chain32_v0"

    def per_bucket(d):
        from parallel_map_reduce_spark.operators.layout import (
            _bucket_file_counts,
        )
        return _bucket_file_counts(d)

    compactions = 0
    prev_files = sum(per_bucket(prev_dir).values())
    for i in range(1, 33):
        table = ensure_bucketed_append(
            spark, f"pmrs_chain32_v{i}", "pmrs_chain32", f"{run}v{i}",
            prev_dir, lambda i=i: _mk_bands(spark, 50 * i, 50 * (i + 1)),
            "sig", n_buckets, compact_files_per_bucket=threshold,
        )
        prev_dir = artifact_path("pmrs_chain32", f"{run}v{i}")
        counts = per_bucket(prev_dir)
        n_files = sum(counts.values())
        if n_files < prev_files:
            compactions += 1
        prev_files = n_files
        assert max(counts.values()) <= threshold, (i, counts)
    assert compactions >= 2, "32-chain never compacted"
    assert pop_link_fallbacks() == [], "same-fs chain paid copy bytes"
    got = {
        (r.doc_id, r.band, r.sig) for r in spark.table(table).collect()
    }
    want = {
        (r.doc_id, r.band, r.sig)
        for r in _mk_bands(spark, 0, 50 * 33).collect()
    }
    assert got == want


def test_promote_link_fallback_exdev_copies_and_records(spark, monkeypatch):
    """VERDICT r13 task 4: on a cross-device layout the promote must
    still be CORRECT (copyfile path) while the degradation is visible
    in the fallback ledger — never silent."""
    import errno
    import os

    from parallel_map_reduce_spark.operators.layout import (
        ensure_bucketed_append,
        ensure_bucketed_table,
        pop_link_fallbacks,
    )
    from parallel_map_reduce_spark.sources.artifact_cache import artifact_path

    run = f"exdev{os.getpid()}"
    ensure_bucketed_table(
        spark, "pmrs_exdev_v0", "pmrs_exdev", f"{run}v0",
        lambda: _mk_bands(spark, 0, 30), "sig", 4,
    )
    pop_link_fallbacks()

    real_link = os.link

    def exdev_link(src, dst, **kw):
        raise OSError(errno.EXDEV, "Invalid cross-device link", src)

    monkeypatch.setattr(os, "link", exdev_link)
    try:
        table = ensure_bucketed_append(
            spark, "pmrs_exdev_v1", "pmrs_exdev", f"{run}v1",
            artifact_path("pmrs_exdev", f"{run}v0"),
            lambda: _mk_bands(spark, 30, 40), "sig", 4,
        )
    finally:
        monkeypatch.setattr(os, "link", real_link)
    fallbacks = pop_link_fallbacks()
    assert fallbacks, "EXDEV degradation was not recorded"
    got = {(r.doc_id, r.band, r.sig) for r in spark.table(table).collect()}
    want = {
        (r.doc_id, r.band, r.sig) for r in _mk_bands(spark, 0, 40).collect()
    }
    assert got == want


def test_promote_base_enoent_raises_with_remedy(spark, monkeypatch):
    """An evicted base artifact must fail the append LOUDLY with the
    re-ensure remedy, not fall through to an uncaught copyfile ENOENT
    (advisor r13)."""
    import errno
    import os

    import pytest

    from parallel_map_reduce_spark.operators.layout import (
        ensure_bucketed_append,
        ensure_bucketed_table,
        pop_link_fallbacks,
    )
    from parallel_map_reduce_spark.sources.artifact_cache import artifact_path

    run = f"enoent{os.getpid()}"
    ensure_bucketed_table(
        spark, "pmrs_enoent_v0", "pmrs_enoent", f"{run}v0",
        lambda: _mk_bands(spark, 0, 30), "sig", 4,
    )

    def gone_link(src, dst, **kw):
        raise FileNotFoundError(errno.ENOENT, "No such file", src)

    monkeypatch.setattr(os, "link", gone_link)
    with pytest.raises(FileNotFoundError, match="re-ensure"):
        ensure_bucketed_append(
            spark, "pmrs_enoent_v1", "pmrs_enoent", f"{run}v1",
            artifact_path("pmrs_enoent", f"{run}v0"),
            lambda: _mk_bands(spark, 30, 40), "sig", 4,
        )
    assert pop_link_fallbacks() == []
