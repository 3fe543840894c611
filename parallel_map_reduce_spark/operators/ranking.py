"""Distributed global ranking — exact ROW_NUMBER / NTILE without the
single-partition sort.

``Window.orderBy(...)`` with no ``partitionBy`` moves EVERY row through
one task — the canonical scale-killer for global ranking at 100 TB. The
decomposition here is the one distributed sorts use (sample → range
boundaries → local sort → prefix offsets), expressed as DataFrame ops:

1. approximate range boundaries for the first order column via
   ``percentile_approx`` (one scan, deterministic);
2. bucket id = a PURE per-row function of the value against those
   boundaries. This is the load-bearing difference from
   ``repartitionByRange``: range partitioning re-samples inside each
   job (boundaries keyed off internal plan ids), so a count job and a
   rank job could disagree about row placement — a value-based bucket
   function cannot;
3. per-bucket local ``row_number`` — each bucket holds ~N/n_buckets
   rows, so the sort work is distributed and bounded;
4. global rn = local rn + prefix offset of the buckets before it.
   Bucket counts are ``n_buckets`` rows of metadata collected to the
   driver — the same footprint as AQE's partition stats, not a data
   collect.

Exactness: the bucket function is monotone in the first order column
and ties on that column land in the same bucket, so local order + prefix
offsets reconstruct the exact global order for any tie-breaking suffix
in ``order_cols`` (callers should pass a unique suffix column for a
fully deterministic total order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_RANGE_BUCKETS = 32
_APPROX_ACC = 10_000  # percentile_approx accuracy: boundary error shifts
# bucket SIZES, never the reconstructed global order


def range_bucket(df: DataFrame, expr, n_buckets: int):
    """A pure per-row Column assigning each row the quantile range bucket
    [0, n_buckets) of ``expr``'s value — boundaries sampled ONCE via
    percentile_approx, then frozen as literals, so (unlike
    repartitionByRange's per-job re-sampling) every job using the
    returned Column agrees about row placement. Skew-proof by
    construction: quantile boundaries equalize bucket sizes whatever the
    value distribution. Shared by global ranking (below) and Z-order
    layout (operators/layout.py)."""
    e = F.col(expr) if isinstance(expr, str) else expr
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.select(
        F.percentile_approx(e.cast("double"), qs, _APPROX_ACC).alias("b")
    ).first()["b"] or []
    # dedup: repeated boundaries (low-cardinality values) would send the
    # same value to an arbitrary bucket among equals — harmless for
    # ranking, but keep buckets canonical
    barr = (
        F.array(*[F.lit(float(b)) for b in bounds]) if bounds else F.array()
    )
    return F.size(F.filter(barr, lambda b: b < e.cast("double")))


def _ranked(df: DataFrame, order_cols: list[str], n_buckets: int, rn_col: str):
    """(df + rn_col, total_rows): shared core for row_number / ntile."""
    bucketed = df.withColumn("_rb", range_bucket(df, order_cols[0], n_buckets))
    counts = {
        r["_rb"]: r["cnt"]
        for r in bucketed.groupBy("_rb").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in range(n_buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    omap = F.create_map(
        *[x for b in range(n_buckets) for x in (F.lit(b), F.lit(offsets[b]))]
    )
    w = Window.partitionBy("_rb").orderBy(*[F.col(c).asc() for c in order_cols])
    ranked = bucketed.withColumn(
        rn_col, (F.row_number().over(w) + omap[F.col("_rb")]).cast("bigint")
    ).drop("_rb")
    return ranked, acc


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int = N_RANGE_BUCKETS,
    rn_col: str = "rn",
) -> DataFrame:
    """df + a global 1-based row number in ``order_cols`` order, with no
    single-partition exchange anywhere in the plan."""
    ranked, _ = _ranked(df, order_cols, n_buckets, rn_col)
    return ranked


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    n_buckets: int = N_RANGE_BUCKETS,
    out_col: str = "tile",
) -> DataFrame:
    """df + the exact SQL NTILE(k) bucket in ``order_cols`` order.

    NTILE's remainder rule (N = q*k + r: the first r tiles get q+1 rows,
    the rest q) is reproduced with integer arithmetic over the global
    row number — bit-identical to ``NTILE(k) OVER (ORDER BY ...)``
    without that window's single-task sort.
    """
    ranked, n = _ranked(df, order_cols, n_buckets, "_gnt_rn")
    q, r = divmod(n, k)
    rn = F.col("_gnt_rn")
    head = r * (q + 1)  # rows living in the q+1-sized tiles
    tile = F.when(
        rn <= head, F.floor((rn - 1) / (q + 1)) + 1
    ).otherwise(
        # max(q,1): when N < k, every row is in the head branch and this
        # divisor is never used — but ANSI mode evaluates eagerly and
        # would raise DIVIDE_BY_ZERO for q=0 without the guard.
        F.lit(r) + F.floor((rn - head - 1) / max(q, 1)) + 1
    )
    return ranked.withColumn(out_col, tile.cast("bigint")).drop("_gnt_rn")


def global_cumsum(
    df: DataFrame,
    order_col: str,
    val_cols: list[str],
    n_buckets: int = N_RANGE_BUCKETS,
    suffix: str = "_cum",
) -> DataFrame:
    """df + exact global running SUM(val) in ``order_col`` order for each
    value column — the cumulative-sum sibling of ``global_row_number``,
    with the same no-single-partition guarantee: quantile range buckets
    on the order column, per-bucket local window sums, and per-bucket
    prefix offsets (n_buckets rows of metadata collected, never data).
    ``order_col`` must be unique (callers order by a key); values must
    be integer-exact or order-insensitive for the decomposition to be
    bit-identical to the single-task window. NULL values count as 0
    (matching the driver-side offset accumulation, which coalesces
    NULL bucket sums to 0) — without the in-window coalesce, a NULL
    row would poison every later row in its bucket, diverging from
    the offsets' treatment of the same rows."""
    bucketed = df.withColumn("_rb", range_bucket(df, order_col, n_buckets))
    per_bucket = (
        bucketed.groupBy("_rb")
        .agg(*[F.sum(c).alias(c) for c in val_cols])
        .collect()
    )
    sums = {r["_rb"]: r for r in per_bucket}
    offsets: dict[str, dict[int, int]] = {c: {} for c in val_cols}
    acc = dict.fromkeys(val_cols, 0)
    for b in range(n_buckets):
        for c in val_cols:
            offsets[c][b] = acc[c]
            acc[c] += (sums[b][c] or 0) if b in sums else 0
    w = (
        Window.partitionBy("_rb")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = bucketed
    for c in val_cols:
        omap = F.create_map(
            *[x for b in range(n_buckets) for x in (F.lit(b), F.lit(offsets[c][b]))]
        )
        out = out.withColumn(
            c + suffix,
            (
                F.sum(F.coalesce(F.col(c), F.lit(0))).over(w) + omap[F.col("_rb")]
            ).cast("bigint"),
        )
    return out.drop("_rb")
