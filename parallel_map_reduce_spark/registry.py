"""Query registry — the single source of truth for the driver contract.

Each entry couples a Spark query builder ``(spark, sf_dir) -> DataFrame``
with (where expressible) an ANSI-SQL oracle string DuckDB runs on the
same parquet tables. The driver compares row count + schema +
order-insensitive value hash, with columns sorted BY NAME — so every
computed column is aliased identically on both sides.

Conventions to keep the hash compare stable across engines:
- aggregate doubles are rounded to 4 decimals on BOTH sides (float sums
  differ in the last ulps between engines / reduction orders);
- arrays are rendered as space-joined strings;
- timestamps used as group keys are truncated/cast identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        _REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that register queries.
    from . import queries as _queries  # noqa: F401

    return dict(_REGISTRY)
