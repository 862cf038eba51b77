"""PageRank as repeated sparse gather-scatter joins (north_rule kernel).

Semantics: standard damped power iteration with uniform teleport and
dangling-mass redistribution:

    r'(v) = (1-d)/n + d * ( sum_{u->v} r(u)/outdeg(u)  +  dangling/n )

where dangling = sum of r(u) over vertices with outdeg 0.  This matches
networkx.pagerank's per-iteration update, so per-vertex scores converge
allclose(1e-6) against the reference power iteration (BASELINE.json).

Scale design:
  * edges are hash-partitioned once on ``src`` and cached — every
    superstep's join reuses that exchange (stable partitioner, SURVEY §4.3);
  * the contribution join shuffles ranks (small: one row per vertex),
    never the edge table;
  * map-side partial aggregation handles moderate in-degree skew, AQE
    skew-join splitting handles the rest; for extreme hubs the CSR path
    (motive_spark.graph.csr) salts the gather;
  * each superstep checkpoints to Parquet → lineage truncation + resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from motive_spark.checkpoint import CheckpointManager


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-6,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """Returns (id, rank). ``tol=None`` runs exactly ``max_iter`` supersteps
    (fixed-iteration mode used by the DuckDB oracle); otherwise stops when
    the L1 delta drops below ``tol``.
    """
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select("src", "dst").repartition(npart, "src").cache()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_deg"))
    # vertex base table: id, out_deg (0 for dangling) — small, cached
    base = (
        verts.join(outdeg, on="id", how="left")
        .select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .repartition(npart, "id")
        .cache()
    )
    n = base.count()
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    ckpt = CheckpointManager(spark, checkpoint_dir)
    start_iter = 0
    ranks = base.select("id", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    if resume and checkpoint_dir is not None:
        last = ckpt.latest()
        if last is not None:
            ranks = ckpt.load(last)
            start_iter = last + 1

    for i in range(start_iter, max_iter):
        # dangling mass: ranks of zero-outdeg vertices (scalar)
        with_deg = ranks.join(base, on="id")
        dangling = (
            with_deg.where(F.col("out_deg") == 0).agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        contribs = (
            with_deg.where(F.col("out_deg") > 0)
            .join(e, on=[with_deg.id == e.src])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("recv"))
        )
        new_ranks = base.join(contribs, on="id", how="left").select(
            "id",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("recv"), F.lit(0.0))
                + F.lit(damping * dangling / n)
            ).alias("rank"),
        )
        new_ranks = ckpt.save(new_ranks.repartition(npart, "id"), i)
        if tol is not None:
            delta = (
                new_ranks.join(ranks.withColumnRenamed("rank", "old"), on="id")
                .agg(F.sum(F.abs(F.col("rank") - F.col("old"))).alias("d"))
                .collect()[0][0]
            )
            ckpt.counters[-1]["l1_delta"] = delta
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks.select("id", "rank")
