"""Shared BFS spanning-forest builder for the tree-based kernels.

Articulation points and bridges are both TREE-INDEPENDENT properties
computed over an arbitrary spanning forest (Tarjan–Vishkin works for
any rooted spanning tree; every bridge belongs to every spanning
forest and a tree edge is a bridge iff no non-tree edge's tree path
covers it).  Both kernels therefore share this construction: roots
from hash-min components of the FULL graph, then synchronous BFS
levels that discover the forest as they root it (first-assignment
wins, candidate parents resolve deterministically to the min neighbor
id).  Compared to building a Boruvka MSF first, this removes an
entire multi-round phase AND yields the minimum-height tree per
component — every downstream height- or radius-bound loop (rooting
folds, preorder, leaf peeling) runs its fewest possible rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from motive_spark.kernels.components import connected_components


def bfs_forest(
    und: DataFrame, max_rounds: int = 300
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """``und``: canonical (src < dst, no self-loops, deduped) undirected
    edges.  Returns ``(assigned, roots, sym, height)``:

    * ``assigned`` — (id, parent, depth) per vertex, parent NULL for
      roots; eagerly checkpointed;
    * ``roots`` — (id) one min-id root per component;
    * ``sym`` — the cached symmetrized edge table (caller unpersists);
    * ``height`` — number of BFS levels run (>= true forest height).
    """
    spark = und.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    sym = (
        und.select("src", "dst")
        .unionByName(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(npart, "src")
        .cache()
    )
    roots = (
        connected_components(und.select("src", "dst"))
        .select(F.col("component").alias("id"))
        .distinct()
    )
    seed = (
        roots.select(
            "id",
            F.lit(None).cast("long").alias("parent"),
            F.lit(0).alias("depth"),
        )
        .repartition(npart, "id")
        .localCheckpoint()
    )
    state = seed
    backing = seed
    frontier = seed.select("id")
    level = 0
    while not frontier.isEmpty():
        level += 1
        if level > max_rounds:
            raise RuntimeError("bfs_forest: rooting exceeded max_rounds")
        # fused union-agg level (the CC/SSSP exchange shape): old_depth
        # is the row-exists marker (depth is never NULL; parent IS NULL
        # for roots, so it cannot distinguish the cases)
        relax = sym.join(
            frontier.select(F.col("id").alias("src")), "src"
        ).select(F.col("dst").alias("id"), F.col("src").alias("parent"))
        merged = (
            state.select("id", "parent", "depth", F.lit(1).alias("tag"))
            .unionByName(
                relax.select(
                    "id",
                    "parent",
                    F.lit(level).alias("depth"),
                    F.lit(0).alias("tag"),
                )
            )
            .groupBy("id")
            .agg(
                F.min(F.when(F.col("tag") == 1, F.col("depth"))).alias(
                    "old_depth"
                ),
                F.min(F.when(F.col("tag") == 1, F.col("parent"))).alias(
                    "old_parent"
                ),
                F.min(F.when(F.col("tag") == 0, F.col("parent"))).alias(
                    "new_parent"
                ),
            )
            .localCheckpoint()
        )
        backing.unpersist()
        backing = merged
        state = merged.select(
            "id",
            F.when(F.col("old_depth").isNotNull(), F.col("old_parent"))
            .otherwise(F.col("new_parent"))
            .alias("parent"),
            F.coalesce("old_depth", F.lit(level)).alias("depth"),
        )
        frontier = merged.where(F.col("old_depth").isNull()).select("id")
    assigned = state.localCheckpoint()
    backing.unpersist()
    return assigned, roots, sym, level
