"""k-core decomposition by iterative peeling.

Beyond-reference link-graph kernel: the k-core is the maximal subgraph
in which every vertex has degree >= k — the standard density filter a
web-scale link pipeline runs before expensive motif work.

Each peel round is one degree aggregation plus two semi-joins (edges
keep only both-endpoints-alive rows), with lineage truncated per round
— the same iterative-plan discipline as the other kernels, nothing per
vertex ever reaches the driver except the per-round survivor count.
``max_rounds=None`` peels to the fixpoint; a fixed ``max_rounds`` gives
deterministic unrolled semantics the DuckDB oracle replicates exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int | None = None,
) -> DataFrame:
    """Returns (id) — vertices of the k-core (or of the partially peeled
    graph after exactly ``max_rounds`` rounds)."""
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    alive = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(npart, "src")
        .localCheckpoint(eager=True)
    )
    n_edges = alive.count()
    rounds = 0
    while n_edges > 0:
        deg = (
            alive.select(F.col("src").alias("id"))
            .unionAll(alive.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k).select("id")
        new_alive = (
            alive.join(keep.withColumnRenamed("id", "src"), on="src", how="leftsemi")
            .join(keep.withColumnRenamed("id", "dst"), on="dst", how="leftsemi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_new = new_alive.count()
        rounds += 1
        converged = n_new == n_edges
        alive, n_edges = new_alive, n_new
        if converged or (max_rounds is not None and rounds >= max_rounds):
            break
    deg = (
        alive.select(F.col("src").alias("id"))
        .unionAll(alive.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return deg.where(F.col("deg") >= k).select("id")
