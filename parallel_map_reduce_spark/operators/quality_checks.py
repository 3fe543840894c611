"""Declarative data-quality validation (Deequ-style constraint suites).

A pipeline ingesting 100 TB/day needs its constraint checks to cost ONE
scan, not one scan per rule: every rule here compiles to a
``sum(case when violated)`` over the same pass, so the whole suite is a
single partial-aggregated job whose exchange carries |rules| rows.
Rules are plain Column predicates — they fuse into codegen and any
rule on a scannable column benefits from pushdown-pruned input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _orders_checks() -> list[tuple[str, F.Column]]:
    """The orders-table constraint suite: (rule_name, must-hold predicate)."""
    return [
        ("custkey_not_null", F.col("o_custkey").isNotNull()),
        ("totalprice_positive", F.col("o_totalprice") > 0),
        ("status_in_domain", F.col("o_orderstatus").isin("O", "F", "P")),
        (
            "orderdate_in_range",
            (F.col("o_orderdate") >= F.lit("1992-01-01"))
            & (F.col("o_orderdate") < F.lit("2002-01-01")),
        ),
        ("orderkey_unique_nonneg", F.col("o_orderkey") >= 0),
    ]


def validate(df: DataFrame, checks: list[tuple[str, F.Column]]) -> DataFrame:
    """(check, n_rows, n_violations) per rule — the whole suite in one
    scan. A rule's violation count is sum(1 - holds); nulls in the
    predicate count as violations (a null 'holds' is not a pass)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for name, pred in checks:
        aggs.append(
            F.sum(
                F.when(pred.isNull() | ~pred, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias(name)
        )
    wide = df.agg(*aggs)
    # unpivot to (check, n_rows, n_violations) — |rules| rows of metadata
    names = [n for n, _ in checks]
    pairs = F.array(
        *[
            F.struct(F.lit(n).alias("check"), F.col(n).alias("n_violations"))
            for n in names
        ]
    )
    return (
        wide.select("n_rows", F.explode(pairs).alias("p"))
        .select(F.col("p.check").alias("check"), "n_rows", F.col("p.n_violations").alias("n_violations"))
    )


def orders_quality_report(orders: DataFrame) -> DataFrame:
    return validate(orders, _orders_checks())
