"""Sampled betweenness centrality — bounded-horizon Brandes.

The standard centrality the kernel family still lacked: how much
shortest-path traffic flows THROUGH each vertex.  Exact Brandes is one
BFS + one reverse accumulation per source; the distributed, sampled
variant (public literature: Brandes 2001; Riondato & Kornaropoulos'
sampling analysis) runs the pivot sources *batched in one state table*
— exactly how the SSSP/harmonic kernels batch theirs — and truncates
at a fixed hop horizon so every round count is known to the oracle.

Forward (per round, all sources at once): frontier ⋈ stationary
symmetric edge table → per-(source, vertex) SUM of path counts σ,
anti-join against visited state — one equi-join + one sum-aggregation,
the CC/SSSP exchange shape.  σ is an exact integer.

Backward (Brandes dependency accumulation, levels deep→shallow):

    δ(v) = Σ_{w ∈ succ(v)}  σ(v) · (SCALE + δ(w)) // σ(w)

quantized to integer 1/SCALE units with floor division — both engines
evaluate the identical positive-integer expression, so the sums are
order-independent and bit-equal.  Truncation at ``depth`` makes this
the bounded-horizon estimator (paths longer than ``depth`` hops don't
contribute — the same fixed-round convention as the harmonic kernel;
the source sample size and horizon are the accuracy/cost dials).

Overflow bound: each term is ≤ σ_max·(SCALE + δ_max).  With integer σ
(≤ deg^depth) and δ ≤ n_sources·|V|·SCALE the default SCALE=1e5 keeps
terms < 2^62 up to ~1e8-path regimes; pass a smaller ``scale`` for
denser graphs (the docstring math is the caller's contract).

Reference parity note: the reference engine has no betweenness; this
is beyond-reference coverage for the link-graph tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def betweenness_sampled(
    edges: DataFrame,
    sources: list[int],
    depth: int = 4,
    scale: int = 100_000,
    directed: bool = False,
) -> DataFrame:
    """Returns (id, bc_q): betweenness in integer 1/``scale`` units,
    summed over the sampled sources, 0 for vertices no sampled
    shortest path passes through.  Every vertex that appears as an
    edge endpoint gets a row."""
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    # Brandes path counting assumes a SIMPLE graph: parallel edges
    # would multiply sigma
    e = e.distinct().repartition(npart, "src").cache()

    # union of BOTH endpoints: under directed=True a vertex appearing
    # only as a destination still gets its promised zero-filled row
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    state = spark.createDataFrame(
        [(int(s), int(s), 0, 1) for s in sorted(set(sources))],
        "source long, id long, dist int, sigma long",
    ).localCheckpoint(eager=True)
    frontier = state
    backing = state

    for lvl in range(1, depth + 1):
        # ONE fused aggregation per BFS level: raw relax rows (tag 0)
        # union the standing state (tag 1) and group on (source, id) —
        # a vertex already in state keeps its sigma/dist (old_sigma is
        # non-null, dist_old < lvl so min picks it); a newly discovered
        # vertex sums its relax sigmas exactly as the old separate
        # cand-groupBy + left_anti did.  One shuffle + one checkpoint
        # per level instead of two aggregation/join passes + three
        # materializations.
        relax = frontier.join(e, on=[frontier.id == e.src]).select(
            "source",
            F.col("dst").alias("id"),
            F.lit(lvl).cast("int").alias("dist"),
            "sigma",
            F.lit(0).alias("tag"),
        )
        merged = (
            state.select(
                "source", "id", "dist", "sigma", F.lit(1).alias("tag")
            )
            .unionByName(relax)
            .groupBy("source", "id")
            .agg(
                F.min("dist").alias("dist"),
                F.min(F.when(F.col("tag") == 1, F.col("sigma"))).alias(
                    "old_sigma"
                ),
                F.sum(F.when(F.col("tag") == 0, F.col("sigma"))).alias(
                    "cand_sigma"
                ),
            )
            .localCheckpoint(eager=True)
        )
        backing.unpersist()
        backing = merged
        state = merged.select(
            "source",
            "id",
            "dist",
            F.coalesce("old_sigma", "cand_sigma").alias("sigma"),
        )
        frontier = merged.where(F.col("old_sigma").isNull()).select(
            "source", "id", "dist", F.col("cand_sigma").alias("sigma")
        )

    # backward accumulation: delta rows exist only where non-zero
    delta = spark.createDataFrame([], "source long, id long, delta long")
    for lvl in range(depth - 1, 0, -1):
        v = state.where(F.col("dist") == lvl).select(
            "source", F.col("id").alias("vid"), F.col("sigma").alias("vsig")
        )
        # rename w's source: v and w share state's lineage, and equal
        # expr-ids would otherwise lean on Spark's self-join repair
        # heuristic (the "trivially true equals predicate" warning)
        w = (
            state.where(F.col("dist") == lvl + 1)
            .select(
                F.col("source").alias("wsource"),
                F.col("id").alias("wid"),
                F.col("sigma").alias("wsig"),
            )
            .join(
                delta.select(
                    F.col("source").alias("wsource"),
                    F.col("id").alias("wid"),
                    F.col("delta").alias("wdelta"),
                ),
                on=["wsource", "wid"],
                how="left",
            )
            .select(
                "wsource",
                "wid",
                "wsig",
                F.coalesce("wdelta", F.lit(0)).alias("wdelta"),
            )
        )
        # integer floor division — all operands positive, so Spark DIV
        # (truncate) and DuckDB // (floor) agree bit-for-bit
        term = F.expr(f"vsig * ({scale} + wdelta) DIV wsig")
        d_lvl = (
            v.join(e, on=[v.vid == e.src])
            .join(w, on=[F.col("dst") == w.wid, v.source == F.col("wsource")])
            .groupBy(v.source, F.col("vid").alias("id"))
            .agg(F.sum(term).alias("delta"))
        )
        new_delta = delta.unionByName(d_lvl).localCheckpoint(eager=True)
        delta.unpersist()
        delta = new_delta

    bc = (
        delta.join(state.select("source", "id", "dist"), on=["source", "id"])
        .where(F.col("dist") > 0)
        .groupBy("id")
        .agg(F.sum("delta").alias("bc_q"))
    )
    out = (
        verts.join(bc, on="id", how="left")
        .select("id", F.coalesce("bc_q", F.lit(0)).alias("bc_q"))
    )
    out = out.localCheckpoint(eager=True)
    for tmp in (e, verts, backing, delta):
        tmp.unpersist()
    return out
