"""Grouped-map Pandas UDF surface: per-group exact quantile summaries.

``applyInPandas`` is the third Arrow-batched Python surface (alongside
``mapInPandas`` in multimodal/ and ``applyInPandasWithState`` in
streaming/): the whole group arrives as one pandas DataFrame, the right
shape for algorithms that need the complete group in memory (exact
quantiles, per-group model fits). Exact quantiles are deliberately the
demo: Spark's built-in ``percentile_approx`` is the scale default, but
an exact per-group computation is the honest applyInPandas use case —
and groups here (event types) are low-cardinality with bounded size.

At 100 TB: group count bounds parallelism and the largest group must fit
one executor's memory — the same contract as any grouped-map UDF. For
high-cardinality keys this shape is fine; for giant single groups you'd
fall back to percentile_approx or a distributed quantile sketch.

Quantile math is numpy's linear interpolation, which matches DuckDB's
``quantile_cont``; results are rounded to 6 decimals on both sides since
the interpolation arithmetic orders differently across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

QUANTILES = (0.25, 0.5, 0.75, 0.95)

QUANTILE_SCHEMA = (
    "event_type STRING, n BIGINT, q25 DOUBLE, q50 DOUBLE, q75 DOUBLE, q95 DOUBLE"
)


def _group_quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"].to_numpy(dtype=float)
    qs = np.quantile(v, QUANTILES, method="linear") if len(v) else [np.nan] * len(QUANTILES)
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [len(v)],
            "q25": [round(float(qs[0]), 6)],
            "q50": [round(float(qs[1]), 6)],
            "q75": [round(float(qs[2]), 6)],
            "q95": [round(float(qs[3]), 6)],
        }
    )


def event_value_quantiles(events: DataFrame) -> DataFrame:
    """(event_type, n, q25, q50, q75, q95) via applyInPandas."""
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_group_quantiles, schema=QUANTILE_SCHEMA)
    )


# NB: the return type must be a DataType instance, not a DDL string —
# a DDL string is parsed lazily via the active SparkSession, and this
# module is also imported by Python WORKERS (to unpickle the grouped-map
# fn above), where no session exists; a string here crashes the import
# and every UDF in the module with SESSION_OR_CONTEXT_NOT_EXISTS.
@pandas_udf(DoubleType())
def mean_abs_dev(v: pd.Series) -> float:
    """Grouped-AGG pandas UDF (Series → scalar): mean absolute deviation
    around the group mean. The fifth UDF surface (alongside grouped-map,
    mapInPandas, Arrow UDTF, applyInPandasWithState): Spark plans it as
    a real aggregate — partial Arrow batches stream per group, no
    collect — so it composes with groupBy like any built-in. Rounded to
    4 dp inside the UDF so the oracle compare is engine-stable."""
    m = v.mean()
    return round(float((v - m).abs().mean()), 4)
