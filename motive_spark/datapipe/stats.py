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


def approx_percentiles_binned(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bin_width: int,
    percentiles: list[tuple[str, int, int]] = (
        ("p50", 1, 2),
        ("p95", 19, 20),
    ),
) -> DataFrame:
    """Approximate group percentiles from a FIXED-WIDTH-BIN histogram
    sketch: the reported value is the lower edge of the first bin whose
    cumulative count reaches ceil(num/den * n), so the error is bounded
    by ``bin_width`` regardless of data size or distribution.

    This is the scale path when ``group_percentiles``'s exact histogram
    is too wide: a high-cardinality value column (timestamps, raw
    floats quantized to cents) makes the exact per-group window as big
    as the distinct-value count, while the binned sketch is bounded by
    range/bin_width buckets — mergeable, map-side-combinable, constant
    state per group.  The same shape as Spark's own
    ``approx_percentile`` but with a DETERMINISTIC, engine-replayable
    definition (no sampling, no GK-summary implementation detail), so
    the DuckDB oracle reproduces every output bit-for-bit.

    ``value_col`` must be integer-typed (quantize money to cents
    first).  Bin index is true floor division, computed as
    ``(v - pmod(v, w)) / w`` so negative values bin correctly in both
    engines (plain integer ``DIV`` truncates toward zero in Spark).
    """
    if bin_width <= 0:
        raise ValueError("approx_percentiles_binned: bin_width must be > 0")
    v = F.col(value_col).cast("long")
    w = F.lit(int(bin_width)).cast("long")
    lo_edge = (v - F.pmod(v, w)).alias("edge")  # bin lower edge, exact
    hist = df.groupBy(F.col(group_col).alias("g"), lo_edge).agg(
        F.count(F.lit(1)).alias("c")
    )
    win = (
        Window.partitionBy("g")
        .orderBy("edge")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "g",
        "edge",
        F.sum("c").over(win).alias("cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("n"),
    )
    aggs = [F.max("n").alias("n_rows")]
    for name, num, den in percentiles:
        target = F.expr(f"({num}L * n + {den - 1}L) DIV {den}L")
        aggs.append(
            F.min(F.when(F.col("cum") >= target, F.col("edge"))).alias(name)
        )
    return cum.groupBy(F.col("g").alias(group_col)).agg(*aggs)
