"""Grouped time-series analytics: OLS trend fits and exact EWMA.

The reference computes one static batch artifact (`src/tema1.cpp` —
the index is rebuilt, never analyzed over time). A 100 TB pipeline
needs trend/drift primitives over its metric streams; these two are the
exact-arithmetic building blocks (the approximate siblings live in
queries/streaming_batch.py's sketch family).

Numeric discipline shared by both operators (the repo-wide rule that
keeps DuckDB oracle hashes bit-stable): every ORDER-SENSITIVE reduction
runs over exact types — BIGINT/DECIMAL sums, which Spark and DuckDB
both reduce exactly in any order — and floating point only enters in a
FIXED-SHAPE scalar expression over those exact aggregates, which IEEE
754 makes bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    x_scale: float = 1.0,
) -> DataFrame:
    """Per-group ordinary-least-squares fit of y against x.

    ``x`` must be an exact integer column (e.g. epoch seconds relative
    to a base instant — subtract the base FIRST so squared sums stay
    narrow); ``y`` a DECIMAL column. All five sufficient statistics
    (Sx, Sy, Sxy, Sxx, Syy) are exact sums — one partial+final hash
    aggregate, zero extra shuffles, mergeable across increments (this
    is the textbook map-side-combinable regression: the same shape
    MLlib's summarizer uses). The closed-form slope/intercept/r2 are
    then fixed double expressions; ``x_scale`` rescales the slope's
    x-unit (e.g. 3600.0 -> per-hour from per-second x).

    At 100 TB nothing changes: the aggregate state is 6 numbers per
    group regardless of row count.
    """
    xd = x.cast("decimal(12,0)")
    yd = y.cast("decimal(12,4)")
    g = df.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy  # n^2 * covariance
    var_n = n * sxx - sx * sx  # n^2 * variance(x)
    vary_n = n * syy - sy * sy
    slope = cov_n / var_n
    return g.select(
        *group_cols,
        F.col("n"),
        F.round(slope * F.lit(float(x_scale)), 6).alias("slope"),
        F.round((sy - slope * sx) / n, 4).alias("intercept"),
        F.round((cov_n * cov_n) / (var_n * vary_n), 6).alias("r2"),
    )


def ewma_weights(alpha: float, lookback: int) -> list[str]:
    """Exact decimal literals for alpha*(1-alpha)^k, k=0..lookback-1.

    Computed once on the driver with Python's exact decimal/fraction
    arithmetic and embedded as literals in BOTH the Spark plan and the
    oracle SQL — so no engine ever calls pow() on a float in the
    reduction (libm results are not guaranteed identical across
    engines; literal constants are).
    """
    from decimal import Decimal

    a = Decimal(str(alpha))
    one = Decimal(1)
    out = []
    w = a
    for _ in range(lookback):
        # The weights ride into the plan as DECIMAL(18,17) literals
        # (group_ewma); an alpha/lookback combination whose exact
        # expansion needs more than 17 fractional digits would be
        # silently rounded there, breaking the documented exactness
        # contract — fail loudly instead. (Exponent-based check: str()
        # flips to E-notation below 1e-6, so string parsing would lie.)
        frac_digits = max(0, -w.as_tuple().exponent)
        if frac_digits > 17:
            raise ValueError(
                f"ewma weight {w} needs {frac_digits} fractional digits; "
                f"DECIMAL(18,17) literals hold at most 17 — widen the "
                f"literal type in group_ewma (and the oracle SQL) before "
                f"using alpha={alpha!r}, lookback={lookback!r}"
            )
        out.append(str(w))
        w = w * (one - a)
    return out


def group_ewma(
    hourly: DataFrame,
    group_cols: list[str],
    hour_col: str,
    val_dec_col: str,
    alpha: float,
    lookback: int,
) -> DataFrame:
    """Exact finite-window EWMA over per-group hourly aggregates.

    ewma(t) = sum_k w_k * x(t-k) / sum_k w_k over the k in [0,lookback)
    whose lag-hour actually exists, with w_k = alpha*(1-alpha)^k as
    exact decimal literals (see ewma_weights). Implemented as a
    bounded-lag self-equi-join on (group, lag bucket): each hour row
    joins its up-to-``lookback`` successors by exploding the k offsets
    on the SMALL aggregated side — never on the raw fact table. The
    fact table is collapsed to |groups| x |hours| rows FIRST, so the
    join input is metadata-sized at any corpus scale; weighting is a
    CASE over literal decimals, the weighted sum is an exact decimal
    reduction, and the single division at the end is the only float op.
    """
    ws = ewma_weights(alpha, lookback)
    w_map = F.create_map(
        *[x for k, w in enumerate(ws) for x in (F.lit(k), F.lit(w).cast("decimal(18,17)"))]
    )
    src = hourly.select(
        *group_cols,
        F.col(hour_col).alias("_src_hour"),
        F.col(val_dec_col).alias("_x"),
        F.explode(F.sequence(F.lit(0), F.lit(lookback - 1))).alias("_k"),
    ).withColumn(
        "_dst_hour", F.col("_src_hour") + F.make_interval(hours=F.col("_k"))
    )
    anchor = hourly.select(*group_cols, F.col(hour_col).alias("_dst_hour"))
    joined = anchor.join(src, [*group_cols, "_dst_hour"], "inner")
    w = w_map[F.col("_k")]
    return (
        joined.groupBy(*group_cols, "_dst_hour")
        .agg(
            F.sum(w * F.col("_x")).alias("_wx"),
            F.sum(w).alias("_wsum"),
            F.count("*").cast("bigint").alias("n_terms"),
        )
        .select(
            *group_cols,
            F.col("_dst_hour").alias(hour_col),
            F.col("n_terms"),
            F.round(
                F.col("_wx").cast("double") / F.col("_wsum").cast("double"), 6
            ).alias("ewma"),
        )
    )


def group_holt(
    hourly: DataFrame,
    group_col: str,
    hour_col: str,
    val_dec_col: str,
    alpha: str = "0.5",
    beta: str = "0.3",
) -> DataFrame:
    """Holt linear (double exponential) smoothing per group — the
    genuinely RECURSIVE time-series primitive EWMA's bounded window
    can't express: level/trend states fold over the whole series.

    Runs as a grouped-map pandas UDF over the (already aggregated,
    metadata-sized) per-group hourly series — the applyInPandas shape
    for custom sequential state. Scale note: the corpus-sized work is
    the hourly pre-aggregation upstream; each group's series here is
    bounded by |hours|, the recursion is O(1) state per step, and
    groups parallelize across tasks.

    Exactness contract (what makes this oracle-able, unlike typical
    float smoothers): inputs are DECIMAL(18,4), every level/trend
    update quantizes to 6 decimal places with HALF_UP — matching
    DuckDB's decimal ROUND tie behavior (away from zero) — and all
    arithmetic is exact decimal, so an independent recursive-CTE
    replay produces bit-identical values. Init: level_0 = x_0
    (quantized), trend_0 = 0.
    """
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    import pandas as pd

    a = Decimal(alpha)
    b = Decimal(beta)
    one = Decimal(1)
    q6 = Decimal("0.000001")

    out_schema = (
        f"{group_col} string, {hour_col} timestamp, "
        "level double, trend double, forecast_next double"
    )

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(hour_col)
        levels: list[float] = []
        trends: list[float] = []
        nexts: list[float] = []
        with localcontext() as ctx:
            ctx.prec = 50  # exact for 18-digit operands times 1-dp params
            level: Decimal | None = None
            trend = Decimal(0)
            for x in pdf[val_dec_col]:
                xd = Decimal(x)
                if level is None:
                    level = xd.quantize(q6, ROUND_HALF_UP)
                    trend = Decimal(0).quantize(q6)
                else:
                    prev = level
                    level = (a * xd + (one - a) * (prev + trend)).quantize(
                        q6, ROUND_HALF_UP
                    )
                    trend = (b * (level - prev) + (one - b) * trend).quantize(
                        q6, ROUND_HALF_UP
                    )
                levels.append(float(level))
                trends.append(float(trend))
                nexts.append(float(level + trend))
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                hour_col: pdf[hour_col],
                "level": levels,
                "trend": trends,
                "forecast_next": nexts,
            }
        )

    return hourly.select(group_col, hour_col, val_dec_col).groupBy(group_col).applyInPandas(
        fit, out_schema
    )


def group_trend_anomalies(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Per-row trend-residual anomaly flags: fit the group's OLS line
    (same exact sufficient statistics as ``group_ols``), then score
    every observation by its studentized residual z = (y - yhat) /
    sigma, sigma = sqrt(SSE / (n - 2)), flagging |z| > ``z_thresh`` —
    the classic residual screen for metric monitoring, composed from
    the trend fit instead of duplicating it.

    Exactness: the sums are BIGINT/DECIMAL (order-free); slope /
    intercept / sigma / z are fixed-shape double expressions over them
    (IEEE-identical across engines; sqrt is correctly rounded). Groups
    too small or too flat to studentize (n <= 2 or sigma == 0) emit
    z = 0, never NULL/Inf. Plan: one fact exchange for the sums, the
    |groups|-row fit broadcast back onto the rows — two passes over
    the (already aggregated) input, zero extra wide shuffles.
    """
    xd = x.cast("decimal(12,0)")
    yd = y.cast("decimal(18,4)")
    rows = df.select(*group_cols, xd.alias("_x"), yd.alias("_y"))
    g = rows.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    sse = syy - intercept * sy - slope * sxy
    sigma = F.sqrt(F.greatest(sse / (n - 2), F.lit(0.0)))
    fit = g.select(
        *group_cols,
        slope.alias("_slope"),
        intercept.alias("_intercept"),
        F.when(F.col("n") > 2, sigma).otherwise(F.lit(0.0)).alias("_sigma"),
    )
    scored = rows.join(F.broadcast(fit), group_cols)
    resid = F.col("_y").cast("double") - (
        F.col("_intercept") + F.col("_slope") * F.col("_x").cast("double")
    )
    zcol = F.when(
        F.col("_sigma") > 0, F.round(resid / F.col("_sigma"), 4)
    ).otherwise(F.lit(0.0))
    return scored.select(
        *group_cols,
        F.col("_x").cast("bigint").alias("x"),
        F.round(F.col("_y").cast("double"), 4).alias("y"),
        zcol.alias("z"),
        (F.abs(zcol) > z_thresh).cast("int").alias("is_anomaly"),
    )
