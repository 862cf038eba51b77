"""HyperBall — approximate neighborhood function via HyperLogLog balls.

Boldi–Rosa–Vigna's HyperBall (public literature: "HyperANF" /
"Four degrees of separation"): every vertex keeps a tiny HyperLogLog
sketch of the set of vertices within t hops; one synchronous round
replaces each sketch with the register-wise MAX of its own and its
neighbors' sketches, so after t rounds the sketch estimates |ball(v,t)|
— the building block for effective-diameter / average-distance
estimation at sizes where exact BFS-from-everywhere is impossible.

Layout is a DENSE per-vertex register row: a sketch is ONE row
(id, r0..r31) — register j holds max rho, absent registers 0 — so a
round is

    (state ∪ (state ⋈ sym edges)) groupBy id, 32 scalar max() aggs

one equi-join + one max-aggregation (the CC exchange shape), |V| rows
of state and |E| relax rows per round, map-side-combinable, fully
whole-stage-codegen'd (an F.max per register column — NOT interpreted
higher-order functions).  r6 note: the r1-r5 layout was sparse rows
(id, j, r), which shuffled |E|·R rows per round; the dense row moves
R-times fewer rows and ~4x fewer bytes through the exchange for b=5,
with bit-identical results (register max is associative; an absent
register and r=0 contribute the same 2^rmax term to S).

Register derivation is the md5 trick (cross-engine byte-identical):
``h = md5(id|seed)``; register j = first-8-hex mod R; rho = leading
zeros of the second-8-hex 32-bit word + 1 = 33 − LENGTH(BIN(w)) —
string/integer ops only, so the DuckDB oracle replays every register.

The returned per-vertex size estimate keeps the raw-HLL harmonic sum
as an EXACT integer S = Σ_j 2^(rmax − r_j) (absent registers count
2^rmax); only the final estimate alpha·R²·2^rmax / S is a float,
computed per row from exact integers and rounded — the same
exact-integers-until-the-last-expression discipline as modularity.
No small-range linear-counting correction is applied (documented raw
estimator: bias corrections branch on float thresholds, which is
exactly the cross-engine hazard the integer discipline avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# alpha_m for m=32 registers (Flajolet et al. 2007, table constant)
_ALPHA_32 = 0.697


def hyperball(
    edges: DataFrame,
    rounds: int = 3,
    b: int = 5,
    rmax: int = 40,
    seed: int = 7,
    directed: bool = False,
) -> DataFrame:
    """Returns (id, s_int, ball_est): after ``rounds`` register-union
    rounds, the exact integer harmonic sum S and the raw HLL estimate
    of |ball(id, rounds)|.  R = 2**b registers; only b=5 ships a
    tuned alpha constant."""
    if b != 5:
        raise ValueError("hyperball: only b=5 (32 registers) is tuned")
    R = 1 << b
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().repartition(npart, "dst").cache()

    h = F.md5(F.concat_ws("|", F.col("id").cast("string"), F.lit(str(seed))))
    j = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % R
    w32 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    # leading zeros of a 32-bit word + 1; w32 == 0 would be all-zero
    # (probability 2^-32) — capped at rmax like every rho
    rho = F.least(
        F.when(w32 == 0, F.lit(rmax)).otherwise(
            F.lit(33) - F.length(F.bin(w32))
        ),
        F.lit(rmax),
    ).cast("int")

    # seed every endpoint, not just sources: under directed=True a
    # sink vertex (in-degree only) must still own its register row so
    # its singleton sketch merges into predecessors' balls (the
    # undirected path already has every vertex on the src side).
    # Dense layout: one row per vertex, register columns r0..r31 (0 =
    # absent; own register j seeded to rho).
    reg_cols = [f"r{i}" for i in range(R)]
    state = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", j.alias("j"), rho.alias("rho"))
        .select(
            "id",
            *[
                F.when(F.col("j") == i, F.col("rho"))
                .otherwise(F.lit(0))
                .cast("int")
                .alias(c)
                for i, c in enumerate(reg_cols)
            ],
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(rounds):
        nbr = state.join(e, on=[state.id == e.dst]).select(
            F.col("src").alias("id"), *reg_cols
        )
        new_state = (
            state.unionByName(nbr)
            .groupBy("id")
            .agg(*[F.max(c).alias(c) for c in reg_cols])
            .localCheckpoint(eager=True)
        )
        state.unpersist()  # superseded round's blocks are dead
        state = new_state

    # exact integer harmonic sum: register r contributes 2^(rmax - r)
    # (r=0 == absent == 2^rmax) — pure integer shifts, no float until
    # the final estimate
    s_int = sum(
        (F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - {c})") for c in reg_cols),
        F.lit(0).cast("long"),
    ).cast("long")
    est = F.round(
        F.lit(float(_ALPHA_32 * R * R * (1 << rmax))) / F.col("s_int"), 6
    )
    return state.select("id", s_int.alias("s_int")).select(
        "id", "s_int", est.alias("ball_est")
    )
