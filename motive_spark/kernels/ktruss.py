"""k-truss decomposition by iterative support peeling.

Beyond-reference link-graph kernel (the reference engine has none —
this extends the k-core density filter from vertices to edges): the
k-truss is the maximal subgraph in which every edge closes at least
k-2 triangles.  It is the standard cohesion filter a link pipeline
runs between k-core (too permissive) and clique mining (too
expensive) — Cohen 2008, public literature.

Physical shape per peel round, all codegen'd DataFrame ops:

1. enumerate canonical triangles a<b<c over the alive edge set with
   the SAME two-join shape as the triangle-count kernel (wedge join
   (a,b)⋈(b,c) + closing-edge equi-join on (a,c)) — every triangle
   materializes exactly once;
2. explode each triangle into its three edge roles and count per
   edge — map-side-combinable sum, never more rows than 3·|triangles|;
3. keep edges with support >= k-2 via one inner join on the edge key.

Lineage is truncated every round (localCheckpoint) and the superseded
round's blocks are released — the iterative-plan discipline shared by
every kernel in this package.  ``max_rounds=None`` peels to the
fixpoint; a fixed ``max_rounds`` gives deterministic unrolled
semantics the DuckDB oracle replays exactly (the same fixed-round
convention as k_core / shortest_paths).

Scale note: the wedge join shuffles on the shared endpoint, so a hub
vertex of degree d contributes d² wedge rows; at 100-TB scale the
caller applies the same degree-cap / k-core pre-filter discipline the
link-prediction operator documents (a vertex that cannot be in a
k-truss by degree alone — deg < k-1 — is dropped by an initial k-core
pass, which is why ``pre_core=True`` runs one cheap degree peel
first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _support(alive: DataFrame) -> DataFrame:
    """Per-edge triangle count within ``alive`` (canonical src<dst
    rows).  Returns (src, dst, supp) for edges in >=1 triangle."""
    e1 = alive.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = alive.select(F.col("src").alias("b2"), F.col("dst").alias("c"))
    e3 = alive.select(F.col("src").alias("a3"), F.col("dst").alias("c3"))
    tri = (
        e1.join(e2, on=[F.col("b") == F.col("b2")])
        .join(
            e3,
            on=[F.col("a") == F.col("a3"), F.col("c") == F.col("c3")],
        )
        .select("a", "b", "c")
    )
    roles = tri.select(
        F.array(
            F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
            F.struct(F.col("b").alias("src"), F.col("c").alias("dst")),
            F.struct(F.col("a").alias("src"), F.col("c").alias("dst")),
        ).alias("r")
    ).select(F.explode("r").alias("r")).select("r.src", "r.dst")
    return roles.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("supp"))


def k_truss(
    edges: DataFrame,
    k: int,
    max_rounds: int | None = None,
    pre_core: bool = True,
) -> DataFrame:
    """Returns (src, dst, supp): the canonical (src<dst) edges of the
    k-truss — or of the partially peeled graph after exactly
    ``max_rounds`` support-peel rounds — each with its triangle
    support in the FINAL surviving subgraph (0 for triangle-free
    survivors, possible only before convergence or for k <= 2)."""
    if k < 2:
        raise ValueError("k_truss: k must be >= 2")
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
    if pre_core:
        # an edge in the k-truss has endpoints of degree >= k-1; one
        # degree peel removes hopeless hubs' leaves before the first
        # (quadratic-in-degree) wedge join — pure pruning, the truss
        # fixpoint is unchanged
        deg = (
            alive.select(F.col("src").alias("id"))
            .unionAll(alive.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.where(F.col("deg") >= k - 1).select("id")
        alive = (
            alive.join(
                keep.withColumnRenamed("id", "src"), on="src", how="leftsemi"
            )
            .join(
                keep.withColumnRenamed("id", "dst"), on="dst", how="leftsemi"
            )
            .localCheckpoint(eager=True)
        )

    n_edges = alive.count()
    rounds = 0
    while n_edges > 0:
        supp = _support(alive)
        new_alive = (
            alive.join(
                supp.where(F.col("supp") >= k - 2), on=["src", "dst"]
            )
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n_new = new_alive.count()
        rounds += 1
        converged = n_new == n_edges
        alive.unpersist()
        alive, n_edges = new_alive, n_new
        if converged or (max_rounds is not None and rounds >= max_rounds):
            break

    supp = _support(alive)
    out = (
        alive.join(supp, on=["src", "dst"], how="left")
        .select(
            "src", "dst", F.coalesce("supp", F.lit(0)).alias("supp")
        )
        .localCheckpoint(eager=True)
    )
    alive.unpersist()
    return out
