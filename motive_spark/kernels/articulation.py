"""Articulation (cut-vertex) detection: Tarjan–Vishkin biconnectivity.

A vertex is an articulation point iff removing it disconnects its
component.  Sequential detection is DFS low-link; DFS does not
distribute.  Tarjan & Vishkin (1985, public literature) showed
biconnectivity needs only an ARBITRARY rooted spanning tree: build an
auxiliary graph whose vertices are the tree edges, connect tree edges
that provably share a biconnected component, and take connected
components of the auxiliary graph — each aux component is one
biconnected component of G.

With per-component preorder numbers pre(v), subtree sizes size(v), and
subtree reach bounds

    low(v)  = min pre over subtree(v) and its non-tree neighbors
    high(v) = max pre over the same set

the auxiliary edges are exactly (validated against a Tarjan oracle on
300 random graphs before this port):

  R1. for each non-tree edge {a, b} with NEITHER endpoint an ancestor
      of the other: link e_a — e_b (e_w = the tree edge (parent(w), w));
  R2. for each tree edge (p, v) with p non-root: link e_v — e_p iff
      low(v) < pre(p) or high(v) >= pre(p) + size(p) (subtree(v)
      escapes p's subtree, so both edges sit in one block).

Then v (non-root) is an articulation point iff some child edge lands
in a different aux component than v's own parent edge, and a root iff
its children edges span >= 2 aux components.

Distributed shape — everything is a fixed number of *passes*, each a
per-level loop of small joins over the tree (lineage truncated every
round; round count = tree height, the documented chain-graph caveat):

  1.+2.+3. roots = hash-min components of the full graph (min vertex
     id), then BFS rooting → (parent, depth) per level — the spanning
     tree IS the BFS forest (min-neighbor parents), discovered while
     rooting;
  4. bottom-up fold → subtree sizes;
  5. top-down pass → per-component preorder (sibling offsets = one
     windowed prefix-sum per parent group, bounded by fan-out);
  6. bottom-up fold → low/high from non-tree reach;
  7. aux edges (two joins) → connected_components kernel → verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from motive_spark.kernels.components import connected_components
from motive_spark.kernels.forest import bfs_forest


def articulation_points(
    edges: DataFrame,
    weight_col: str | None = None,
    max_rounds: int = 300,
) -> DataFrame:
    """Returns (id) — the articulation vertices of the undirected
    graph.  ``weight_col`` is accepted for API compatibility but no
    longer influences the internal spanning tree (the cut-vertex set
    is tree-independent; the tree is the BFS forest)."""
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    und = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            *(
                [F.col(weight_col).cast("long").alias("w")]
                if weight_col
                else [F.lit(1).alias("w")]
            ),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))
        .cache()
    )
    # ---- pass 1+2+3 fused: roots + rooted BFS forest in one shared
    # construction (kernels/forest.py).  Tarjan–Vishkin is valid for
    # ANY rooted spanning tree (module docstring), so the old Boruvka
    # MSF phase was pure overhead, and the BFS forest's minimal height
    # shrinks every height-bound pass below.  ``weight_col`` is
    # retained for API compatibility; the output never depended on the
    # tree choice.
    assigned, roots, sym, height = bfs_forest(und, max_rounds=max_rounds)
    tree = (
        assigned.where(F.col("parent").isNotNull())
        .select(
            F.least("parent", "id").alias("src"),
            F.greatest("parent", "id").alias("dst"),
        )
        .cache()
    )
    nontree = (
        und.select("src", "dst")
        .join(tree, ["src", "dst"], "left_anti")
        .cache()
    )
    t2 = sym  # kept name for the downstream unpersist bookkeeping

    children_of = assigned.where(F.col("parent").isNotNull()).select(
        F.col("parent").alias("id"), F.col("id").alias("child")
    )
    n_children = children_of.groupBy("id").agg(
        F.count(F.lit(1)).alias("nc")
    )

    def _bottom_up(values: DataFrame, combine_cols: list) -> DataFrame:
        """Fold per-vertex values up the tree: each round, vertices
        with no pending children finalize and push to their parent.
        ``values``: (id, v1..vk) seed; combine_cols: (name, fn) pairs
        where fn is F.min/F.max/F.sum.  Returns (id, v1..vk) of the
        SUBTREE aggregate per vertex."""
        st = (
            assigned.select("id", "parent")
            .join(values, "id", "left")
            .join(n_children, "id", "left")
            .select(
                "id",
                "parent",
                *[F.col(n) for n, _ in combine_cols],
                F.coalesce("nc", F.lit(0)).alias("pending"),
            )
            .repartition(npart, "id")
            .localCheckpoint()
        )
        done = None
        rounds = 0
        while True:
            # checkpoint the ready set FIRST, then test emptiness on the
            # materialized blocks — one scan of st per round instead of
            # a separate isEmpty pass
            out = (
                st.where(F.col("pending") == 0)
                .select("id", "parent", *[n for n, _ in combine_cols])
                .localCheckpoint()
            )
            if out.isEmpty():
                break
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    "articulation_points: fold exceeded max_rounds"
                )
            done = out if done is None else done.unionByName(out)
            if rounds % 8 == 0:
                done = done.localCheckpoint()
            push = out.where(F.col("parent").isNotNull())
            fold = push.groupBy(F.col("parent").alias("id")).agg(
                *[fn(n).alias(f"_d_{n}") for n, fn in combine_cols],
                F.count(F.lit(1)).alias("_nch"),
            )
            # survivors are exactly the pending>0 rows (ids are unique
            # and pending is never NULL), so the anti-join against the
            # finalized set is a plain filter — one less shuffle join
            # per fold round
            st = (
                st.where(F.col("pending") != 0)
                .join(fold, "id", "left")
                .select(
                    "id",
                    "parent",
                    *[
                        (
                            F.least(
                                F.col(n),
                                F.coalesce(F.col(f"_d_{n}"), F.col(n)),
                            )
                            if fn is F.min
                            else F.greatest(
                                F.col(n),
                                F.coalesce(F.col(f"_d_{n}"), F.col(n)),
                            )
                            if fn is F.max
                            else (
                                F.col(n)
                                + F.coalesce(F.col(f"_d_{n}"), F.lit(0))
                            )
                        ).alias(n)
                        for n, fn in combine_cols
                    ],
                    (
                        F.col("pending") - F.coalesce("_nch", F.lit(0))
                    ).alias("pending"),
                )
                .localCheckpoint()
            )
        return done

    # ---- pass 4: subtree sizes --------------------------------------
    sizes = _bottom_up(
        assigned.select("id", F.lit(1).alias("size")),
        [("size", F.sum)],
    )
    if sizes is None:
        und.unpersist(), tree.unpersist(), t2.unpersist()
        return spark.createDataFrame([], "id long")
    sizes = sizes.select("id", "size").localCheckpoint()

    # ---- pass 5: per-component preorder, top-down ---------------------
    # pre(child_i) = pre(parent) + 1 + sum of earlier siblings' sizes
    sib = children_of.join(
        sizes.select(F.col("id").alias("child"), "size"), "child"
    )
    w_sib = (
        Window.partitionBy("id")
        .orderBy("child")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sib.select(
        "id",
        "child",
        F.coalesce(F.sum("size").over(w_sib), F.lit(0)).alias("off"),
    ).repartition(npart, "id").localCheckpoint()
    pre = (
        roots.select("id", F.lit(0).alias("pre"))
        .repartition(npart, "id")
        .localCheckpoint()
    )
    cur = pre
    for _ in range(height):
        nxt = (
            offsets.join(cur, "id")
            .select(
                F.col("child").alias("id"),
                (F.col("pre") + 1 + F.col("off")).alias("pre"),
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        # lazy union of per-level checkpoints, truncated every 8th
        # level (see BFS rooting above)
        pre = pre.unionByName(nxt)
        if _ % 8 == 7:
            pre = pre.localCheckpoint()
        cur = nxt
    pre = pre.localCheckpoint()

    # ---- pass 6: low/high from non-tree reach -------------------------
    n2 = nontree.unionByName(
        nontree.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    reach = (
        n2.join(
            pre.select(F.col("id").alias("dst"), F.col("pre").alias("np")),
            "dst",
        )
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("np").alias("rlo"), F.max("np").alias("rhi"))
    )
    seed = (
        pre.join(reach, "id", "left")
        .select(
            "id",
            F.least(F.col("pre"), F.coalesce("rlo", F.col("pre"))).alias(
                "low"
            ),
            F.greatest(
                F.col("pre"), F.coalesce("rhi", F.col("pre"))
            ).alias("high"),
        )
    )
    lowhigh = _bottom_up(seed, [("low", F.min), ("high", F.max)]).select(
        "id", "low", "high"
    )

    # ---- pass 7: aux edges, aux CC, verdict ---------------------------
    info = (
        assigned.select("id", "parent")
        .join(pre, "id")
        .join(sizes, "id")
        .localCheckpoint()
    )
    # R1: unrelated non-tree endpoints link their parent edges (aux
    # vertices are identified by the child endpoint of a tree edge)
    ia = info.select(
        F.col("id").alias("src"),
        F.col("pre").alias("pa"),
        F.col("size").alias("sa"),
    )
    ib = info.select(
        F.col("id").alias("dst"),
        F.col("pre").alias("pb"),
        F.col("size").alias("sb"),
    )
    r1 = (
        nontree.join(ia, "src")
        .join(ib, "dst")
        .where(
            ~(
                (F.col("pa") <= F.col("pb"))
                & (F.col("pb") < F.col("pa") + F.col("sa"))
            )
            & ~(
                (F.col("pb") <= F.col("pa"))
                & (F.col("pa") < F.col("pb") + F.col("sb"))
            )
        )
        .select("src", "dst")
    )
    # R2: child subtree escapes the parent's subtree
    pinfo = info.select(
        F.col("id").alias("parent"),
        F.col("parent").alias("gparent"),
        F.col("pre").alias("pp"),
        F.col("size").alias("ps"),
    )
    r2 = (
        assigned.where(F.col("parent").isNotNull())
        .select("id", "parent")
        .join(lowhigh, "id")
        .join(pinfo, "parent")
        .where(F.col("gparent").isNotNull())
        .where(
            (F.col("low") < F.col("pp"))
            | (F.col("high") >= F.col("pp") + F.col("ps"))
        )
        .select(F.col("id").alias("src"), F.col("parent").alias("dst"))
    )
    aux = r1.unionByName(r2)
    # aux CC; tree edges untouched by any aux edge (self-loops are
    # dropped by the CC kernel) are their own singleton block, so the
    # block label is coalesced to the edge id itself
    aux_verts = assigned.where(F.col("parent").isNotNull()).select("id")
    aux_cc = (
        aux_verts.join(
            connected_components(aux).select(
                "id", F.col("component").alias("_blk")
            ),
            "id",
            "left",
        )
        .select(
            F.col("id").alias("child_edge"),
            F.coalesce("_blk", F.col("id")).alias("block"),
        )
    )

    child_block = children_of.join(
        aux_cc.withColumnRenamed("child_edge", "child"), "child"
    )
    # non-root: some child edge in a different block than the own edge
    own_block = aux_cc.select(
        F.col("child_edge").alias("id"), F.col("block").alias("own_blk")
    )
    nonroot = (
        child_block.join(own_block, "id")
        .where(F.col("block") != F.col("own_blk"))
        .select("id")
        .distinct()
    )
    root_art = (
        roots.join(
            child_block.groupBy("id").agg(
                F.countDistinct("block").alias("nb")
            ),
            "id",
        )
        .where(F.col("nb") >= 2)
        .select("id")
    )
    und.unpersist()
    tree.unpersist()
    t2.unpersist()
    nontree.unpersist()
    return nonroot.unionByName(root_art).distinct()
