"""Strongly connected components — distributed coloring algorithm.

Beyond-reference DIRECTED companion to connected_components (which, on
the symmetric co-purchase graph, coincides with weak components).  The
algorithm is Orzan-style coloring, public literature:

  repeat until no vertices remain:
    1. forward min-color propagation to fixpoint: color(v) = the
       smallest vertex id that reaches v (hash-min over in-neighbors,
       the CC kernel's exchange pattern on the directed edge table);
    2. each color class's root r (color(r) = r) anchors one SCC: the
       members are the vertices of color r that reach r BACK — found by
       backward propagation restricted to the color class;
    3. found SCCs are peeled off; the remainder iterates.

Because the root r is, by construction, the minimum id reaching every
member and is itself a member, the emitted scc id is the SCC's minimum
vertex id — the same canonical labeling the DuckDB mutual-reachability
oracle produces, so results compare exactly.

Physical shape: every propagation step is one equi-join + hash
aggregation with per-step lineage truncation; the driver sees only the
per-step changed/remaining COUNTS, never vertex rows.  Inner loops run
O(diameter) supersteps, the outer loop once per peeled SCC layer —
small on real link graphs (bounded by the SCC-DAG depth of the
remaining graph, not the SCC count: every root found in a round peels
in that same round).

Before each coloring round a TRIM pre-pass iteratively peels trivial
SCCs — vertices with zero remaining in- OR out-degree are singleton
components by definition (they can't sit on a cycle).  On link graphs
the vast majority of vertices are trivial (leaf pages, dangling
imports), so trimming removes them in a handful of cheap rounds
(3 semi-joins + 1 count each) instead of paying a full forward+backward
propagation per peel layer; it also bounds the coloring work to the
cyclic remainder.  If the SCC-DAG is deeper than
``max_outer`` (pathological chain-of-SCCs), the function now WARNS and
returns a partial labeling (undetermined vertices carry scc = NULL)
instead of raising after hours of work.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def strongly_connected_components(
    edges: DataFrame,
    max_outer: int = 100,
    max_trim_rounds: int = 200,
    strict: bool = False,
) -> DataFrame:
    """Returns (id, scc) over the directed simple graph; ``scc`` is the
    smallest vertex id of the component.  ``scc`` is NULL only when the
    algorithm hit ``max_outer`` peel rounds before finishing (a warning
    is emitted; the labeled prefix is exact).  Pass ``strict=True`` to
    RAISE instead of returning the partial labeling — for callers that
    would otherwise groupBy(scc) and silently lump every undetermined
    vertex into one NULL pseudo-component."""
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(npart, "src")
        .localCheckpoint(eager=True)
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    assigned_parts: list[DataFrame] = []
    rem_v, rem_e = verts, e

    for _ in range(max_outer):
        # --- 0. trim: peel trivial (acyclic-position) vertices ----------
        # a vertex missing from the remaining src set or the remaining
        # dst set has no out- or no in-edges, so it is its own SCC
        for _t in range(max_trim_rounds):
            core = (
                rem_e.select(F.col("src").alias("id"))
                .distinct()
                .join(
                    rem_e.select(F.col("dst").alias("id")).distinct(),
                    on="id",
                    how="leftsemi",
                )
            )
            trivial = rem_v.join(core, on="id", how="left_anti").localCheckpoint(
                eager=True
            )
            if trivial.limit(1).count() == 0:
                break
            assigned_parts.append(
                trivial.select("id", F.col("id").alias("scc"))
            )
            rem_v = rem_v.join(core, on="id", how="leftsemi").localCheckpoint(
                eager=True
            )
            rem_e = (
                rem_e.join(
                    rem_v.withColumnRenamed("id", "src"),
                    on="src",
                    how="leftsemi",
                )
                .join(
                    rem_v.withColumnRenamed("id", "dst"),
                    on="dst",
                    how="leftsemi",
                )
                .localCheckpoint(eager=True)
            )
        n_rem = rem_v.count()
        if n_rem == 0:
            break
        # --- 1. forward min-color fixpoint -------------------------------
        color = rem_v.select("id", F.col("id").alias("color"))
        while True:
            cand = (
                rem_e.join(
                    color.hint("shuffle_hash"), on=[color.id == rem_e.src]
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("color").alias("cand"))
            )
            # carry the previous color in the same checkpoint so the
            # convergence check scans the materialized round result —
            # no second |V|-row join job per round (the CC pattern)
            new_color = (
                color.join(cand, on="id", how="left")
                .select(
                    "id",
                    F.least(
                        "color", F.coalesce("cand", F.col("color"))
                    ).alias("color"),
                    F.col("color").alias("old"),
                )
                .localCheckpoint(eager=True)
            )
            changed = new_color.where(F.col("color") != F.col("old")).count()
            color = new_color.select("id", "color")
            if changed == 0:
                break
        # --- 2. backward containment within each color class -------------
        # roots seed the mark set; marks spread along REVERSED edges that
        # stay inside one color class
        ce = (
            rem_e.join(
                color.withColumnRenamed("id", "src").withColumnRenamed(
                    "color", "c_src"
                ),
                on="src",
            )
            .join(
                color.withColumnRenamed("id", "dst").withColumnRenamed(
                    "color", "c_dst"
                ),
                on="dst",
            )
            .where(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        marked = color.where(F.col("id") == F.col("color")).select(
            "id", "color"
        ).localCheckpoint(eager=True)
        while True:
            # materialize the frontier once: the count below and the
            # union checkpoint both read it (the lazy form recomputed
            # the whole semi/anti/join chain twice per round)
            newly = (
                ce.join(
                    marked.withColumnRenamed("id", "dst").drop("color"),
                    on="dst",
                    how="leftsemi",
                )
                .select(F.col("src").alias("id"))
                .distinct()
                .join(marked.select("id"), on="id", how="left_anti")
                .join(color, on="id")
                .localCheckpoint(eager=True)
            )
            n_new = newly.count()
            if n_new == 0:
                break
            marked = marked.unionByName(
                newly.select("id", "color")
            ).localCheckpoint(eager=True)
        assigned_parts.append(marked.select("id", F.col("color").alias("scc")))
        # --- 3. peel ------------------------------------------------------
        rem_v = rem_v.join(
            marked.select("id"), on="id", how="left_anti"
        ).localCheckpoint(eager=True)
        rem_e = (
            rem_e.join(
                rem_v.withColumnRenamed("id", "src"), on="src", how="leftsemi"
            )
            .join(rem_v.withColumnRenamed("id", "dst"), on="dst", how="leftsemi")
            .localCheckpoint(eager=True)
        )

    # completion is detected by rem_v emptiness AFTER the loop (a graph
    # that fully peels on exactly the max_outer-th round is complete);
    # anything left gets an honest NULL label + a warning (or a raise
    # under strict=True)
    if rem_v.limit(1).count() > 0:
        if strict:
            raise RuntimeError(
                "strongly_connected_components: SCC-DAG deeper than "
                f"max_outer={max_outer} (strict=True); raise max_outer "
                "or accept a partial labeling with strict=False"
            )
        warnings.warn(
            "strongly_connected_components: SCC-DAG deeper than "
            f"max_outer={max_outer}; returning a partial labeling "
            "(undetermined vertices have scc=NULL)",
            RuntimeWarning,
            stacklevel=2,
        )
        assigned_parts.append(
            rem_v.select("id", F.lit(None).cast("long").alias("scc"))
        )

    if not assigned_parts:
        return spark.createDataFrame([], "id long, scc long")
    out = assigned_parts[0]
    for p in assigned_parts[1:]:
        out = out.unionByName(p)
    return out
