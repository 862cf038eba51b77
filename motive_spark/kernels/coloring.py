"""Distributed greedy graph coloring (deterministic Jones–Plassmann).

The parallel-scheduling primitive a link-graph engine needs next to
components/labels: a proper vertex coloring gives conflict-free update
waves (two adjacent vertices never share a color), register/slot
assignment, and a cheap chromatic upper bound.

Round t: every still-uncolored vertex whose PRIORITY is the strict
maximum among its uncolored neighbors colors itself with the smallest
color absent from its already-colored neighborhood.  Priorities are
``md5(id|seed) * 2^31 + id`` — deterministic, distinct per vertex, and
byte-identical in DuckDB, so the contract oracle replays every round
exactly.  Independent winners per round make the rule race-free by
construction (a winner's uncolored neighbors all lost this round).

Plan shape per round (all codegen joins + aggregations, no windows):
one (uncolored ⋈ edges ⋈ uncolored) max-priority aggregation to find
winners, one (winner ⋈ edges ⋈ colored) used-color set, and the
smallest-free-color via explode(sequence(0, n_used)) anti-join — the
same relational formulation the oracle uses, no higher-order-function
interpretation on the hot path.  State is one row per vertex;
lineage is truncated every round (localCheckpoint), the fixed-round
contract leaves unreached vertices NULL (same convention as seeded
label propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_coloring(
    edges: DataFrame,
    rounds: int = 5,
    seed: int = 11,
) -> DataFrame:
    """Returns (id, color) — ``color`` NULL for vertices not yet
    reached after ``rounds`` Jones–Plassmann rounds.  Colored vertices
    are guaranteed conflict-free (no edge joins two equal colors)."""
    from motive_spark.graph.normalize import undirect

    und = undirect(edges)
    sym = (
        und.select("src", "dst")
        .unionAll(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    # priority h*2^31 + id is injective (and BIGINT-safe: h < 2^32 so
    # h*2^31 + id < 2^63) only for ids < 2^31 — JP's race-freedom proof
    # needs distinct priorities, so larger ids fail fast per row instead
    # of silently colliding or overflowing under ANSI mode
    pri = F.when(
        (F.col("id") >= 0) & (F.col("id") < F.lit(1 << 31)),
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("id").cast("string"), F.lit(str(seed))
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        * F.lit(1 << 31)
        + F.col("id"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "greedy_coloring: vertex ids must be in [0, 2^31) for the "
                "injective JP priority; remap ids (graph.normalize."
                "dense_index) first"
            )
        ).cast("long")
    )
    state = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", pri.alias("pri"), F.lit(None).cast("long").alias("color"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        unc = state.where(F.col("color").isNull()).select("id", "pri")
        # JP converges in O(log n) expected rounds; once every vertex
        # is colored the remaining rounds are no-ops — stop paying for
        # them (one narrow scan of the checkpointed state per round)
        if unc.isEmpty():
            break
        # max uncolored-neighbor priority per uncolored vertex
        nbr = (
            unc.select(F.col("id").alias("src"), F.col("pri").alias("spri"))
            .join(sym, on="src")
            .join(
                unc.select(
                    F.col("id").alias("dst"), F.col("pri").alias("npri")
                ),
                on="dst",
            )
            .groupBy("src")
            .agg(F.max("npri").alias("max_nbr"))
        )
        # winners feeds both the used-color gather and the candidate
        # explode; used feeds both its count and the anti-join — cache
        # each so the multi-join subtrees evaluate once per round
        # (released after the round's checkpoint materializes)
        winners = (
            unc.join(nbr, on=[unc.id == nbr.src], how="left")
            .where(F.col("max_nbr").isNull() | (F.col("pri") > F.col("max_nbr")))
            .select("id")
            .cache()
        )
        colored = state.where(F.col("color").isNotNull()).select(
            F.col("id").alias("dst"), F.col("color").alias("ncolor")
        )
        used = (
            winners.select(F.col("id").alias("src"))
            .join(sym, on="src")
            .join(colored, on="dst")
            .select(F.col("src").alias("id"), "ncolor")
            .distinct()
            .cache()
        )
        n_used = used.groupBy("id").agg(F.count(F.lit(1)).alias("n_used"))
        cand = (
            winners.join(n_used, on="id", how="left")
            .select(
                "id",
                F.explode(
                    F.sequence(
                        F.lit(0), F.coalesce("n_used", F.lit(0))
                    )
                ).alias("c"),
            )
        )
        free = (
            cand.join(
                used,
                on=[cand.id == used.id, cand.c == used.ncolor],
                how="left_anti",
            )
            .groupBy("id")
            .agg(F.min("c").alias("new_color"))
        )
        new_state = (
            state.join(free, on="id", how="left")
            .select(
                "id",
                "pri",
                F.coalesce("color", "new_color").alias("color"),
            )
            .localCheckpoint(eager=True)
        )
        state.unpersist()  # superseded round's blocks are dead
        winners.unpersist()
        used.unpersist()
        state = new_state
    return state.select("id", "color")
