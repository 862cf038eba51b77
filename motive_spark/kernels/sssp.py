"""Multi-source weighted shortest paths — frontier Bellman-Ford.

The missing member of the gather-scatter kernel family (PageRank / CC /
LP / triangles / SCC / k-core): single- or multi-source shortest path
distances over non-negative integer edge weights, as synchronous
relaxation rounds:

    d_r(s, v) = min(d_{r-1}(s, v), min_{u->v} d_{r-1}(s, u) + w(u, v))

Physical shape per round: one equi-join (frontier ⋈ edges on the source
endpoint — the stationary edge table is hash-partitioned once and
cached, only the frontier moves) + one (source, id) min-aggregation +
per-round lineage truncation — exactly the CC kernel's exchange
pattern.  Relaxation proceeds from the FRONTIER only (rows whose
distance improved last round): by induction this yields the identical
d_r as full relaxation (a non-improved vertex's relaxations were
already applied and are dominated), while shrinking the moving side to
the active set — the standard distributed Bellman-Ford trick.

``rounds=N`` runs exactly N synchronous rounds with no convergence
check — the DuckDB oracle unrolls the same recurrence, so fixed-round
results compare EXACTLY (integer weights, no floats anywhere).
``rounds=None`` iterates to convergence (bounded by ``max_rounds``,
warning on overflow): rounds needed = max edge count of any shortest
path, <= the graph's hop diameter for metric-ish weights.
"""

from __future__ import annotations

import time as _time
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shortest_paths(
    edges: DataFrame,
    sources: list[int],
    weight_col: str | None = None,
    rounds: int | None = None,
    max_rounds: int = 50,
    directed: bool = False,
    round_timings: list | None = None,
) -> DataFrame:
    """Returns (source, id, dist): minimum path weight from each source
    to every reached vertex (unreached vertices are absent).  Weights
    default to 1 per edge (hop distance = multi-source BFS); pass
    ``weight_col`` for integer weighted edges."""
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    e = edges.select("src", "dst", w.alias("w"))
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    # parallel edges keep only their lightest copy — fewer relax rows,
    # identical distances
    e = (
        e.groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(npart, "src")
        .cache()
    )

    srcs = sorted({int(s) for s in sources})
    if len(srcs) > 1 and _dense_lanes_pay(
        e, len(srcs), rounds if rounds is not None else max_rounds
    ):
        return _shortest_paths_dense(
            spark, e, srcs, rounds, max_rounds, round_timings
        )

    state = spark.createDataFrame(
        [(int(s), int(s), 0) for s in srcs],
        "source long, id long, dist long",
    ).localCheckpoint(eager=True)
    frontier = state

    fixed = rounds is not None
    n_rounds = rounds if fixed else max_rounds
    converged = False
    merged = None
    for _ in range(n_rounds):
        _t0 = _time.time() if round_timings is not None else 0.0
        relax = frontier.join(e, on=[frontier.id == e.src]).select(
            "source",
            F.col("dst").alias("id"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        # ONE aggregation computes both successors: carry the previous
        # distance as a second min (state rows tag old=dist, relax rows
        # old=NULL; min ignores nulls and each (source, id) has at most
        # one state row, so old IS the prior distance).  new_state and
        # the frontier are narrow projections of the same checkpointed
        # result — one shuffle + one materialization per round instead
        # of the old agg + diff-join + second checkpoint.
        new_merged = (
            state.select(
                "source", "id", "dist", F.col("dist").alias("old")
            )
            .unionByName(
                relax.withColumn("old", F.lit(None).cast("long"))
            )
            .groupBy("source", "id")
            .agg(F.min("dist").alias("dist"), F.min("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        new_state = new_merged.select("source", "id", "dist")
        new_frontier = new_merged.where(
            F.col("old").isNull() | (F.col("dist") < F.col("old"))
        ).select("source", "id", "dist")
        # release the PREVIOUS round's checkpoint blocks now that the
        # successor is materialized: state is O(|sources|*|V|) rows,
        # and without this the kernel's storage footprint grows
        # linearly with rounds (measured: back-to-back runs in one JVM
        # slowed 2-3x as dead blocks piled up ahead of driver GC).
        # Round 1's predecessor is the seed checkpoint itself.
        (merged if merged is not None else state).unpersist()
        merged = new_merged
        state, frontier = new_state, new_frontier
        if round_timings is not None:
            # one relaxation superstep = the relax join + fused
            # state/frontier min-agg, materialized by ONE checkpoint
            round_timings.append(_time.time() - _t0)
        if not fixed and frontier.limit(1).count() == 0:
            converged = True
            break
    if not fixed and not converged:
        warnings.warn(
            f"shortest_paths: not converged within max_rounds={max_rounds};"
            " distances are the best found so far",
            RuntimeWarning,
            stacklevel=2,
        )
    e.unpersist()
    # state/frontier are narrow projections of the final ``merged``
    # checkpoint, which stays alive as the returned result's backing
    return state


def _dense_lanes_pay(e: DataFrame, n_sources: int, rounds: int) -> bool:
    """Auto-switch between the long (source, id) state and the dense
    per-source-column state, by EXPECTED FRONTIER SATURATION.  Dense
    lanes pay an n_sources-wide row for every relax row; they win when
    source frontiers overlap (each edge row then replaces up to
    n_sources long rows) and lose while frontiers are small and
    disjoint (most lanes NULL, pure width overhead).  Frontiers
    saturate once BFS trees of fan-out ~avg_deg cover the vertex set,
    so the decision scalar is

        n_sources * avg_deg ** rounds / |V|   (>= 0.5 -> dense)

    computed in log space from one aggregation over the (cached, about
    to be materialized anyway) edge table.  Measured both ways at both
    regimes: dense 1.9-2.0x faster on the saturated bench fixture
    (avg_deg ~120), long 1.4-1.6x faster on a 1M-vertex / 10M-edge ER
    graph at 4 fixed rounds (coverage ~0.08).  Either path returns
    bit-identical distances — this is a speed dial only."""
    import math

    row = e.agg(
        F.count(F.lit(1)).alias("m"),
        F.approx_count_distinct("src").alias("v"),
    ).collect()[0]
    m, v = int(row["m"]), max(int(row["v"]), 1)
    avg_deg = m / v
    if avg_deg <= 1.0:
        return False
    log_cov = (
        math.log(n_sources) + rounds * math.log(avg_deg) - math.log(v)
    )
    return log_cov >= math.log(0.5)


def _shortest_paths_dense(
    spark,
    e: DataFrame,
    srcs: list[int],
    rounds: int | None,
    max_rounds: int,
    round_timings: list | None,
) -> DataFrame:
    """Multi-source rounds with ONE distance column per source (the
    hyperball dense-register shape): each relax round joins |E| edge
    rows once instead of |sources| * |E| long-format rows, and the
    fused old-as-second-min aggregation runs per column.  The frontier
    moves at VERTEX granularity — a vertex improved for any source
    re-relaxes all its columns — which relaxes a superset of the
    long-format (source, id) frontier and a subset of full synchronous
    relaxation; both bracket the same fixpoint recurrence, so distances
    are identical (integer mins, no floats).  Output is unpivoted back
    to the long (source, id, dist) contract, reached vertices only."""
    n = len(srcs)
    cols = [f"d{i}" for i in range(n)]
    ocols = [f"o{i}" for i in range(n)]
    schema = "id long, " + ", ".join(f"{c} long" for c in cols)
    state = spark.createDataFrame(
        [
            tuple([s] + [0 if i == j else None for i in range(n)])
            for j, s in enumerate(srcs)
        ],
        schema,
    ).localCheckpoint(eager=True)
    frontier = state

    fixed = rounds is not None
    n_rounds = rounds if fixed else max_rounds
    converged = False
    merged = None
    improved_any = None
    for _ in range(n_rounds):
        _t0 = _time.time() if round_timings is not None else 0.0
        relax = frontier.join(e, on=[frontier.id == e.src]).select(
            F.col("dst").alias("id"),
            *[(F.col(c) + F.col("w")).alias(c) for c in cols],
        )
        new_merged = (
            state.select(
                "id", *cols, *[F.col(c).alias(o) for c, o in zip(cols, ocols)]
            )
            .unionByName(
                relax.select(
                    "id",
                    *cols,
                    *[F.lit(None).cast("long").alias(o) for o in ocols],
                )
            )
            .groupBy("id")
            .agg(
                *[F.min(c).alias(c) for c in cols],
                *[F.min(o).alias(o) for o in ocols],
            )
            .localCheckpoint(eager=True)
        )
        new_state = new_merged.select("id", *cols)
        improved_any = None
        for c, o in zip(cols, ocols):
            imp = F.col(c).isNotNull() & (
                F.col(o).isNull() | (F.col(c) < F.col(o))
            )
            improved_any = imp if improved_any is None else improved_any | imp
        new_frontier = new_merged.where(improved_any).select("id", *cols)
        (merged if merged is not None else state).unpersist()
        merged = new_merged
        state, frontier = new_state, new_frontier
        if round_timings is not None:
            round_timings.append(_time.time() - _t0)
        if not fixed and frontier.limit(1).count() == 0:
            converged = True
            break
    if not fixed and not converged:
        warnings.warn(
            f"shortest_paths: not converged within max_rounds={max_rounds};"
            " distances are the best found so far",
            RuntimeWarning,
            stacklevel=2,
        )
    e.unpersist()
    stack_args = ", ".join(f"{int(s)}L, d{i}" for i, s in enumerate(srcs))
    return (
        state.select(
            "id", F.expr(f"stack({n}, {stack_args}) as (source, dist)")
        )
        .where(F.col("dist").isNotNull())
        .select("source", "id", "dist")
    )


def harmonic_centrality(
    edges: DataFrame,
    sources: list[int],
    rounds: int = 6,
    scale: int = 1_000_000,
    directed: bool = False,
) -> DataFrame:
    """Sampled harmonic centrality (Boldi & Vigna's estimator, public
    literature): H(v) = sum over sample sources s != v of 1/d(s, v),
    with distances from ``rounds`` synchronous BFS rounds of the
    shortest-paths kernel (hop metric).

    The per-source contributions are quantized to ``round(scale/d)``
    BEFORE summing, so the aggregation is an exact integer sum —
    order-independent, hence bit-identical in the DuckDB oracle.
    Returns (id, harmonic_x1e6, n_reached); vertices reached by no
    source are absent.  At 100-TB scale the source sample size is the
    accuracy/cost dial (|sources| BFS frontiers run in ONE state
    table, batched exactly like k_hop).
    """
    d = shortest_paths(edges, sources, rounds=rounds, directed=directed)
    pos = d.where(F.col("dist") > 0)
    contrib = F.round(F.lit(float(scale)) / F.col("dist")).cast("long")
    return pos.groupBy("id").agg(
        F.sum(contrib).alias("harmonic_x1e6"),
        F.count(F.lit(1)).alias("n_reached"),
    )


def delta_stepping(
    edges: DataFrame,
    sources: list[int],
    delta: int,
    weight_col: str | None = None,
    directed: bool = False,
    max_outer: int = 200,
    max_inner: int = 100,
) -> DataFrame:
    """Delta-stepping shortest paths (Meyer & Sanders 2003, public
    literature): distances settle in bucket order (bucket = dist DIV
    delta); inside a bucket only LIGHT edges (w <= delta) re-relax
    until the bucket drains, then HEAVY edges (w > delta) relax once
    from the settled bucket — the classical middle ground between
    Dijkstra (work-optimal, serial) and Bellman-Ford (parallel,
    work-wasteful).

    Converged output is exactly Dijkstra's: (source, id, dist) for
    every reached vertex, identical to ``shortest_paths(rounds=None)``
    — delta changes the SCHEDULE, never the answer.

    Why it beats frontier Bellman-Ford at scale: BF re-relaxes every
    improved vertex each synchronous round, so a heavy edge that a
    cheap multi-hop path later beats still fans out its subtree;
    delta-stepping holds heavy relaxations until their source bucket
    is FINAL, bounding wasted work to intra-bucket light churn.  The
    multi-source batch shares one global bucket index (the minimum
    over sources) — settling "dist < b*delta" is per-source safe
    because the global b lower-bounds every per-source bucket.

    Physical shape per step: identical to the BF kernel — one
    frontier ⋈ stationary-edge-table equi-join + one (source, id)
    min-agg + eager lineage truncation; the light/heavy split is two
    cached hash-partitioned tables built once.
    """
    if delta <= 0:
        raise ValueError("delta_stepping: delta must be a positive integer")
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    e = edges.select("src", "dst", w.alias("w"))
    if not directed:
        e = e.unionByName(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    e = (
        e.groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(npart, "src")
        .cache()
    )
    light = e.where(F.col("w") <= delta).cache()
    heavy = e.where(F.col("w") > delta).cache()

    state = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sorted(set(sources))],
        "source long, id long, dist long",
    ).localCheckpoint(eager=True)
    backing = state  # checkpoint that materializes the current state

    def _relax(frontier: DataFrame, etab: DataFrame, cur: DataFrame):
        """min(cur, frontier ⋈ etab); returns (new_state, improved,
        merged) — new_state/improved are narrow projections of the ONE
        checkpointed fused aggregation (same old-as-second-min trick as
        shortest_paths: one shuffle, one materialization per relax)."""
        relax = frontier.join(etab, on=[frontier.id == etab.src]).select(
            "source",
            F.col("dst").alias("id"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        merged = (
            cur.select("source", "id", "dist", F.col("dist").alias("old"))
            .unionByName(relax.withColumn("old", F.lit(None).cast("long")))
            .groupBy("source", "id")
            .agg(F.min("dist").alias("dist"), F.min("old").alias("old"))
            .localCheckpoint(eager=True)
        )
        new_state = merged.select("source", "id", "dist")
        improved = merged.where(
            F.col("old").isNull() | (F.col("dist") < F.col("old"))
        ).select("source", "id", "dist")
        return new_state, improved, merged

    boundary = 0  # every dist < boundary is final for its source
    for _ in range(max_outer):
        # integer DIV, not float division: dist/delta via doubles is
        # exact only while dist < 2^53 (the repo-wide integer-DIV
        # discipline — see stats.py); dist >= 0 so DIV == floor-div
        head = (
            state.where(F.col("dist") >= boundary)
            .agg(F.min(F.expr(f"dist DIV {int(delta)}")).alias("b"))
            .collect()[0]["b"]
        )
        if head is None:
            break
        b = int(head)
        in_bucket = F.expr(f"dist DIV {int(delta)}") == b
        frontier = state.where(in_bucket)
        for _i in range(max_inner):
            state, improved, new_backing = _relax(frontier, light, state)
            backing.unpersist()
            backing = new_backing
            # only improvements landing back in bucket b re-relax now;
            # later-bucket improvements wait for their own bucket
            # (narrow filters of the already-checkpointed merged — no
            # extra materialization needed)
            frontier = improved.where(in_bucket)
            if frontier.limit(1).count() == 0:
                break
        else:
            warnings.warn(
                f"delta_stepping: bucket {b} not drained within "
                f"max_inner={max_inner}",
                RuntimeWarning,
                stacklevel=2,
            )
        settled = state.where(in_bucket)
        state, improved, new_backing = _relax(settled, heavy, state)
        backing.unpersist()
        backing = new_backing
        boundary = (b + 1) * delta
    else:
        warnings.warn(
            f"delta_stepping: not settled within max_outer={max_outer} "
            "buckets; distances are the best found so far",
            RuntimeWarning,
            stacklevel=2,
        )
    for t in (e, light, heavy):
        t.unpersist()
    return state
