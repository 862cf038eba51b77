"""Exact order statistics, scale-safe: percentiles from a VALUE
HISTOGRAM instead of a per-group sort.

``group_percentiles`` computes exact discrete percentiles (the value at
rank ceil(p * n) of the sorted group) without ever sorting the group's
rows: one (group, value) counting aggregation, then a cumulative-sum
window over the group's DISTINCT values — the window partition is
bounded by value cardinality, not row count, so a billion-row group
with thousands of distinct prices costs a thousands-row window (the
same histogram trick as the link-prediction degree cap).  Percentile
fractions are integer ratios and the target rank is computed in exact
integer arithmetic (``(num*n + den - 1) // den`` = ceil), so the
DuckDB oracle reproduces every output bit-for-bit on integer-valued
columns (quantize money to cents first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: list[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p95", 19, 20),
    ),
) -> DataFrame:
    """(group, n_rows, <name> per percentile): ``<name>`` is the exact
    discrete percentile — the smallest value v whose cumulative count
    reaches ceil(num/den * n).  ``value_col`` should be integer-typed
    for exact cross-engine results."""
    hist = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "g",
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("n"),
    )
    aggs = [F.max("n").alias("n_rows")]
    for name, num, den in percentiles:
        # exact integer ceil-division via the SQL DIV operator on longs
        # (F.floor of a double quotient loses exactness once num*n
        # passes 2^53 — a billion-row group at p=19/20 is within reach)
        target = F.expr(f"({num}L * n + {den - 1}L) DIV {den}L")
        aggs.append(
            F.min(F.when(F.col("cum") >= target, F.col("v"))).alias(name)
        )
    return cum.groupBy(F.col("g").alias(group_col)).agg(*aggs)
