"""Minimum spanning forest — synchronous Boruvka with pointer jumping.

The classic log-round distributed MST algorithm (Boruvka 1926; the
MPC/Pregel standard — public literature): every component picks its
minimum-weight outgoing edge, the chosen edges merge components, repeat;
each round at least halves the component count, so convergence is
O(log |V|) rounds of pure DataFrame joins — no priority queue anywhere.

Determinism: edges are totally ordered by (w, src, dst), which makes
the MSF UNIQUE — both the per-component argmin (min of a packed struct)
and the resulting forest are engine-independent, so a DuckDB oracle can
replay the identical rounds without any float or tie hazard.

Per round, physical shape:

1. label both endpoints of every edge (two broadcast-or-hash joins
   against the (id, comp) table) and keep cross-component rows;
2. per-component argmin = one min-aggregation over a packed struct
   (map-side combinable; never a window/sort);
3. merge the chosen functional graph: with a unique edge order its
   cycles have length exactly 2 (a longer cycle would need strictly
   decreasing weights around it), so one self-join breaks cycles to
   the min-id root, then pointer jumping (parent = parent∘parent)
   flattens chains in O(log chain) rounds;
4. relabel vertices through the flattened parents; chosen edges
   accumulate into the forest.

Lineage is truncated per round (localCheckpoint) and superseded
checkpoint blocks are released — the package-wide iterative-plan
discipline.  At 100-TB scale the edge table stays hash-partitioned on
src and never moves; only the (id, comp) label table (|V| rows) and the
per-round chosen set (≤ #components rows) shuffle.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boruvka_msf(
    edges: DataFrame,
    weight_col: str = "w",
    max_rounds: int = 30,
) -> DataFrame:
    """Returns (src, dst, w): the minimum spanning forest of the
    undirected graph under the total edge order (w, src, dst) —
    canonical src<dst rows, parallel edges collapsed to their
    lightest copy."""
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .repartition(npart, "src")
        .cache()
    )

    labels = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("c"))
        .localCheckpoint(eager=True)
    )
    forest = spark.createDataFrame([], "src long, dst long, w long")
    chosen_ckpts: list[DataFrame] = []  # alive until the final forest build

    for _ in range(max_rounds):
        lab_s = labels.select(
            F.col("id").alias("src"), F.col("c").alias("cu")
        )
        lab_d = labels.select(
            F.col("id").alias("dst"), F.col("c").alias("cv")
        )
        cross = (
            e.join(lab_s, on="src")
            .join(lab_d, on="dst")
            .where(F.col("cu") != F.col("cv"))
            .select("src", "dst", "w", "cu", "cv")
        ).localCheckpoint(eager=True)
        if cross.limit(1).count() == 0:
            cross.unpersist()
            break

        # both orientations so every component sees its incident edges
        cand = cross.select(
            F.col("cu").alias("c"),
            F.struct("w", "src", "dst", F.col("cv").alias("oc")).alias("k"),
        ).unionByName(
            cross.select(
                F.col("cv").alias("c"),
                F.struct(
                    "w", "src", "dst", F.col("cu").alias("oc")
                ).alias("k"),
            )
        )
        chosen = (
            cand.groupBy("c").agg(F.min("k").alias("k")).localCheckpoint(eager=True)
        )
        chosen_ckpts.append(chosen)
        # accumulate lazily over the per-round chosen CHECKPOINTS (kept
        # alive until the final materialization below) — re-checkpointing
        # the growing forest every round was one extra job per round for
        # a table that is only read once at the end
        forest = forest.unionByName(
            chosen.select("k.src", "k.dst", "k.w").distinct()
        )

        # functional parent graph; unique weights → cycles have length 2
        p = chosen.select("c", F.col("k.oc").alias("p"))
        pp = p.select(F.col("c").alias("p"), F.col("p").alias("gp"))
        parent = (
            p.join(pp, on="p", how="left")
            .select(
                "c",
                F.when(
                    (F.col("gp") == F.col("c")) & (F.col("c") < F.col("p")),
                    F.col("c"),
                )
                .otherwise(F.col("p"))
                .alias("p"),
            )
            .localCheckpoint(eager=True)
        )
        parent_backing = parent
        # pointer jumping to the flattened root; the moved flag is
        # computed INSIDE the jump (old vs new parent in one
        # projection), so the convergence probe is a cheap scan of the
        # jump's own checkpointed blocks — not a second join
        while True:
            hop = parent.select(
                F.col("c").alias("p"), F.col("p").alias("gp")
            )
            jumped = (
                parent.join(hop, on="p", how="left")
                .select(
                    "c",
                    F.coalesce("gp", F.col("p")).alias("p"),
                    (
                        F.coalesce("gp", F.col("p")) != F.col("p")
                    ).alias("moved"),
                )
                .localCheckpoint(eager=True)
            )
            changed = jumped.where("moved").limit(1).count()
            parent_backing.unpersist()
            parent_backing = jumped
            parent = jumped.select("c", "p")
            if changed == 0:
                break

        new_labels = (
            labels.join(
                parent.withColumnRenamed("c", "oldc").withColumnRenamed(
                    "p", "newc"
                ),
                on=[labels.c == F.col("oldc")],
                how="left",
            )
            .select("id", F.coalesce("newc", F.col("c")).alias("c"))
            .localCheckpoint(eager=True)
        )
        for tmp in (labels, cross, parent_backing):
            tmp.unpersist()
        labels = new_labels
    else:
        warnings.warn(
            f"boruvka_msf: not converged within max_rounds={max_rounds}",
            RuntimeWarning,
            stacklevel=2,
        )

    out = forest.select("src", "dst", "w").localCheckpoint(eager=True)
    for tmp in (e, labels, *chosen_ckpts):
        tmp.unpersist()
    return out
