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

    srcs = sorted({int(s) for s in sources})
    if len(srcs) > 1:
        # same frontier-saturation auto-switch as shortest_paths: the
        # dense (dist, sigma) lanes only pay once source frontiers
        # overlap (measured: dense 1.5x faster on the saturated bench
        # fixture, long 1.6x faster on a sparse 1M/10M ER graph at
        # depth 3); results are bit-identical either way
        from motive_spark.kernels.sssp import _dense_lanes_pay

        if _dense_lanes_pay(e, len(srcs), depth):
            return _betweenness_dense(spark, e, verts, srcs, depth, scale)

    state = spark.createDataFrame(
        [(int(s), int(s), 0, 1) for s in srcs],
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


def _betweenness_dense(
    spark,
    e: DataFrame,
    verts: DataFrame,
    srcs: list[int],
    depth: int,
    scale: int,
) -> DataFrame:
    """Multi-source batch with one (dist, sigma) column pair per source
    (the dense shortest-paths shape): each forward level joins |E|
    edge rows once instead of once per source.  Sigma sums are NOT
    idempotent, so the vertex-granularity frontier carries per-source
    NULL lanes: a lane holds the newly-discovered sigma ONLY for
    sources that first reached the vertex this level — min/sum ignore
    the NULL lanes, so every per-source aggregation sees exactly the
    rows the long-format kernel would.  The backward Brandes pass runs
    the same way: per-lane gates ``dist_i == lvl`` / ``dist_i ==
    lvl + 1`` restrict each term to its source's level pair, and the
    quantized integer expression is unchanged — results are bit-equal
    to the long format."""
    n = len(srcs)
    dcols = [f"d{i}" for i in range(n)]
    scols = [f"s{i}" for i in range(n)]

    schema = (
        "id long, "
        + ", ".join(f"{c} int" for c in dcols)
        + ", "
        + ", ".join(f"{c} long" for c in scols)
    )
    state = spark.createDataFrame(
        [
            tuple(
                [s]
                + [0 if i == j else None for i in range(n)]
                + [1 if i == j else None for i in range(n)]
            )
            for j, s in enumerate(srcs)
        ],
        schema,
    ).localCheckpoint(eager=True)
    frontier = state  # lanes: sigma where newly discovered, else NULL
    backing = state

    for lvl in range(1, depth + 1):
        relax = frontier.join(e, on=[frontier.id == e.src]).select(
            F.col("dst").alias("id"),
            *[
                F.when(F.col(s).isNotNull(), F.lit(lvl))
                .cast("int")
                .alias(d)
                for d, s in zip(dcols, scols)
            ],
            *scols,
            F.lit(0).alias("tag"),
        )
        merged = (
            state.select("id", *dcols, *scols, F.lit(1).alias("tag"))
            .unionByName(relax)
            .groupBy("id")
            .agg(
                *[F.min(d).alias(d) for d in dcols],
                *[
                    F.min(F.when(F.col("tag") == 1, F.col(s))).alias(
                        f"old_{s}"
                    )
                    for s in scols
                ],
                *[
                    F.sum(F.when(F.col("tag") == 0, F.col(s))).alias(
                        f"cand_{s}"
                    )
                    for s in scols
                ],
            )
            .localCheckpoint(eager=True)
        )
        backing.unpersist()
        backing = merged
        state = merged.select(
            "id",
            *dcols,
            *[
                F.coalesce(f"old_{s}", f"cand_{s}").alias(s)
                for s in scols
            ],
        )
        any_new = None
        for s in scols:
            new_i = F.col(f"old_{s}").isNull() & F.col(
                f"cand_{s}"
            ).isNotNull()
            any_new = new_i if any_new is None else any_new | new_i
        frontier = merged.where(any_new).select(
            "id",
            *dcols,
            *[
                F.when(F.col(f"old_{s}").isNull(), F.col(f"cand_{s}"))
                .alias(s)
                for s in scols
            ],
        )

    # backward accumulation, dense lanes; each (source, vertex) receives
    # its delta at exactly one level, so the per-level merge aggregation
    # sums one non-null value per lane
    lcols = [f"l{i}" for i in range(n)]
    delta = spark.createDataFrame(
        [], "id long, " + ", ".join(f"{c} long" for c in lcols)
    )
    for lvl in range(depth - 1, 0, -1):
        any_v = None
        for d in dcols:
            c = F.col(d) == lvl
            any_v = c if any_v is None else any_v | c
        v = state.where(any_v).select(
            F.col("id").alias("vid"),
            *[
                F.when(F.col(d) == lvl, F.col(s)).alias(f"v{s}")
                for d, s in zip(dcols, scols)
            ],
        )
        any_w = None
        for d in dcols:
            c = F.col(d) == lvl + 1
            any_w = c if any_w is None else any_w | c
        w = (
            state.where(any_w)
            .select(
                F.col("id").alias("wid"),
                *[
                    F.when(F.col(d) == lvl + 1, F.col(s)).alias(f"w{s}")
                    for d, s in zip(dcols, scols)
                ],
            )
            .join(
                delta.select(
                    F.col("id").alias("wid"),
                    *[F.col(c).alias(f"w{c}") for c in lcols],
                ),
                on="wid",
                how="left",
            )
        )
        terms = [
            F.sum(
                F.when(
                    F.col(f"v{s}").isNotNull()
                    & F.col(f"w{s}").isNotNull(),
                    F.expr(
                        f"v{s} * ({scale} + coalesce(w{c}, 0)) DIV w{s}"
                    ),
                )
            ).alias(c)
            for s, c in zip(scols, lcols)
        ]
        d_lvl = (
            v.join(e, on=[v.vid == e.src])
            .join(w, on=[F.col("dst") == w.wid])
            .groupBy(F.col("vid").alias("id"))
            .agg(*terms)
        )
        new_delta = (
            delta.unionByName(d_lvl)
            .groupBy("id")
            .agg(*[F.sum(c).alias(c) for c in lcols])
            .localCheckpoint(eager=True)
        )
        delta.unpersist()
        delta = new_delta

    bc_terms = [
        F.when(
            (F.col(d) > 0) & F.col(c).isNotNull(), F.col(c)
        ).otherwise(F.lit(0))
        for d, c in zip(dcols, lcols)
    ]
    bc_sum = bc_terms[0]
    for t in bc_terms[1:]:
        bc_sum = bc_sum + t
    bc = (
        delta.join(state.select("id", *dcols), on="id")
        .select("id", bc_sum.alias("bc_q"))
    )
    out = (
        verts.join(bc, on="id", how="left")
        .select("id", F.coalesce("bc_q", F.lit(0)).alias("bc_q"))
    )
    out = out.localCheckpoint(eager=True)
    for tmp in (e, verts, backing, delta):
        tmp.unpersist()
    return out
