"""Temporal (time-windowed) interaction graphs.

A link graph derived from an event stream is not one graph — it is a
graph PER TIME WINDOW (the web graph per crawl, the interaction graph
per day).  This module builds tumbling-window edge snapshots from an
event table and computes per-window structural metrics, including the
bipartite→unipartite projection (users co-interacting with the same
item) with the projection's quadratic blowup explicitly capped.

Scale shape: everything is one pass over the events + groupBys keyed
by (window, …) — the window start is just another partition column, so
a year of data fans out across window×key reducers with no per-window
driver loop.  The co-pair projection joins the per-(window, item) user
lists only for items under ``item_cap`` distinct users (a power item —
the front page — would otherwise contribute deg² pairs; the cap is the
same df-cap discipline as the dedup tier's inverted index).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_edges(
    events: DataFrame,
    ts_col: str,
    src_col: Column,
    dst_col: Column,
    window_duration: str = "1 day",
) -> DataFrame:
    """Distinct (win_start, src, dst) edges per tumbling window.
    ``win_start`` is a formatted string (engine-portable, partitionable).
    """
    fmt = (
        "yyyy-MM-dd"
        if window_duration in ("1 day", "1 week")
        else "yyyy-MM-dd HH:mm:ss"
    )
    win = F.window(F.col(ts_col), window_duration)
    return (
        events.select(
            F.date_format(win.start, fmt).alias("win_start"),
            src_col.alias("src"),
            dst_col.alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .dropDuplicates(["win_start", "src", "dst"])
    )


def windowed_graph_metrics(wedges: DataFrame) -> DataFrame:
    """Per-window structural summary of a windowed bipartite edge set:
    edge count, endpoint cardinalities, max source degree."""
    deg = wedges.groupBy("win_start", "src").agg(
        F.count(F.lit(1)).alias("deg")
    )
    base = wedges.groupBy("win_start").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.countDistinct("src").alias("n_src"),
        F.countDistinct("dst").alias("n_dst"),
    )
    mx = deg.groupBy("win_start").agg(F.max("deg").alias("max_src_deg"))
    return base.join(mx, "win_start")


def windowed_copair_count(
    wedges: DataFrame, item_cap: int = 1000
) -> DataFrame:
    """Per-window count of DISTINCT co-interaction pairs (src1 < src2
    sharing a dst in that window) — the unipartite projection edge
    count.  Items whose per-window degree exceeds ``item_cap`` are
    excluded (quadratic-blowup guard, replayed by the oracle)."""
    sized = wedges.groupBy("win_start", "dst").agg(
        F.count(F.lit(1)).alias("ic")
    )
    kept = wedges.join(
        sized.where(F.col("ic") <= item_cap), ["win_start", "dst"]
    ).select("win_start", "dst", "src")
    a = kept.select(
        F.col("win_start").alias("w"),
        F.col("dst").alias("d"),
        F.col("src").alias("u1"),
    )
    b = kept.select(
        F.col("win_start").alias("w2"),
        F.col("dst").alias("d2"),
        F.col("src").alias("u2"),
    )
    return (
        a.join(
            b,
            (F.col("w") == F.col("w2"))
            & (F.col("d") == F.col("d2"))
            & (F.col("u1") < F.col("u2")),
        )
        .select(F.col("w").alias("win_start"), "u1", "u2")
        .dropDuplicates(["win_start", "u1", "u2"])
        .groupBy("win_start")
        .agg(F.count(F.lit(1)).alias("n_copairs"))
    )


def windowed_components(
    wedges: DataFrame, side_offset: int = 1 << 31
) -> DataFrame:
    """Per-window connected components of the bipartite interaction
    snapshots — ALL windows in ONE kernel run: the composite vertex id
    ``win_index·2^33 + local_id`` (dst side offset by ``side_offset``
    to keep the two vertex spaces disjoint) feeds the ordinary
    hash-min CC kernel, so a year of snapshots converges together in
    max-per-window-diameter rounds instead of one kernel launch per
    window.  This is the payoff of windows-as-partition-columns: the
    iterative kernel is oblivious to how many snapshots it is solving.

    Returns (win_start, n_vertices, n_components, max_component) —
    the per-snapshot fragmentation summary.  ``win_start`` must be the
    ``yyyy-MM-dd`` strings produced by ``windowed_edges``."""
    from motive_spark.kernels import connected_components

    win_idx = F.datediff(
        F.to_date("win_start"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    comp_edges = wedges.select(
        (win_idx * F.lit(1 << 33) + F.col("src")).alias("src"),
        (
            win_idx * F.lit(1 << 33) + F.col("dst") + F.lit(side_offset)
        ).alias("dst"),
    )
    cc = connected_components(comp_edges)
    # integer DIV — a double divide loses bits past 2^53 composite ids
    day = F.expr(f"id DIV {1 << 33}")
    per_comp = (
        cc.groupBy(day.alias("d"), "component")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return (
        per_comp.groupBy("d")
        .agg(
            F.sum("sz").alias("n_vertices"),
            F.count(F.lit(1)).alias("n_components"),
            F.max("sz").alias("max_component"),
        )
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int")),
                "yyyy-MM-dd",
            ).alias("win_start"),
            "n_vertices",
            "n_components",
            "max_component",
        )
    )
