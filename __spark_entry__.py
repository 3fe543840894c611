"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship inverted-index query;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (see
``parallel_map_reduce_spark/registry.py`` for conventions that keep the
value-hash comparison stable across engines).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parallel_map_reduce_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from parallel_map_reduce_spark.plans.flagship import flagship_flat

    return flagship_flat(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops omitted
    (driver records a rows-only check for those)."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
