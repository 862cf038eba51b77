"""Bridge (cut-edge) detection: spanning forest + XOR covering tags.

A bridge is an edge whose removal disconnects its endpoints — the
single points of failure in a link graph.  Sequential bridge finding
is a DFS (Tarjan), which does not distribute; the standard
parallel-friendly alternative is the CYCLE-COVER TAGGING scheme (the
XOR trick used in cut/sketch literature, e.g. Ahn-Guha-McGregor-style
graph sketching — public method):

1. take any spanning forest T (we reuse the Boruvka kernel — edges
   totally ordered by (w, src, dst), so T is unique and deterministic);
2. give every NON-tree edge a fixed 60-bit tag, md5-derived from its
   endpoints (deterministic "randomness", engine-replayable);
3. a tree edge e's label is the XOR of tags over non-tree edges whose
   tree path covers e.  A non-tree edge covers exactly the path
   between its endpoints, so depositing its tag at BOTH endpoints and
   XOR-summing over the subtree below e computes the label;
4. e is a bridge  ⟺  no non-tree edge covers it  ⟺  label == 0
   (a tag collision would need XOR of distinct 60-bit md5 tags to
   vanish — probability ~2^-60 per edge, negligible and DETERMINISTIC
   for a given input: the oracle replays the identical tags and gets
   the identical labels).  Non-tree edges are never bridges.

The subtree XOR runs as synchronous LEAF PEELING: every round all
current leaves of the (remaining) forest emit their accumulated value
as the label of their last edge and fold it into their neighbor.  A
round is three small joins against a shrinking edge set; the round
count is the forest RADIUS (all leaves peel simultaneously, so a path
of length L finishes in ~L/2 rounds).  Lineage is truncated per round.
At 100-TB scale the radius of a web-like forest is modest; a
pathological long-chain forest would instead use the O(log) Euler-tour
formulation — the cap raises loudly rather than returning partial
labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from motive_spark.kernels.msf import boruvka_msf


def _edge_tag(src, dst):
    """60-bit deterministic tag for a canonical (src < dst) edge."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", src.cast("string"), dst.cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def bridges(
    edges: DataFrame,
    weight_col: str | None = None,
    max_rounds: int = 300,
) -> DataFrame:
    """Returns the bridge edges (src, dst, is_bridge=true omitted —
    only bridges are returned) of the undirected graph, canonical
    src < dst.  ``weight_col`` only picks WHICH spanning tree Boruvka
    builds (any tree yields the same bridge set); omitted, edges get
    weight 1 and the (1, src, dst) total order still fixes the tree.
    """
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
    tree = boruvka_msf(und, weight_col="w").select("src", "dst").cache()
    nontree = und.select("src", "dst").join(
        tree, ["src", "dst"], "left_anti"
    )

    # deposit each non-tree tag at both endpoints; vertex value = XOR
    tag = _edge_tag(F.col("src"), F.col("dst"))
    val = (
        nontree.select(F.col("src").alias("id"), tag.alias("t"))
        .unionByName(nontree.select(F.col("dst").alias("id"), tag.alias("t")))
        .groupBy("id")
        .agg(F.expr("bit_xor(t)").alias("acc"))
    )
    verts = (
        tree.select(F.col("src").alias("id"))
        .unionByName(tree.select(F.col("dst").alias("id")))
        .distinct()
    )
    acc = (
        verts.join(val, "id", "left")
        .select("id", F.coalesce("acc", F.lit(0)).alias("acc"))
        .repartition(npart, "id")
        .localCheckpoint()
    )
    # remaining forest, both directions
    t2 = (
        tree.select("src", "dst")
        .unionByName(
            tree.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(npart, "src")
        .localCheckpoint()
    )
    und.unpersist()
    tree.unpersist()

    labeled = None
    for _ in range(max_rounds):
        if t2.isEmpty():
            break
        deg = t2.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        leaves = deg.where(F.col("d") == 1).select("src")
        # directed rows (leaf -> its single remaining neighbor)
        peel = t2.join(leaves, "src").select(
            F.col("src").alias("leaf"), F.col("dst").alias("nbr")
        )
        out = (
            peel.join(acc.withColumnRenamed("id", "leaf"), "leaf")
            .select(
                F.least("leaf", "nbr").alias("src"),
                F.greatest("leaf", "nbr").alias("dst"),
                F.col("acc").alias("label"),
            )
            # a 2-vertex remnant peels from both ends with equal labels
            # (component XOR telescopes to 0) — keep one row
            .dropDuplicates(["src", "dst"])
        )
        labeled = out if labeled is None else labeled.unionByName(out)
        # truncate the accumulated union every 8 peel rounds — unbounded
        # lazy unions grow Catalyst re-analysis quadratically on
        # high-radius forests (same discipline as articulation r6)
        if _ % 8 == 7:
            labeled = labeled.localCheckpoint()
        # fold each peeled leaf's value into its neighbor
        delta = (
            peel.join(acc.withColumnRenamed("id", "leaf"), "leaf")
            .groupBy(F.col("nbr").alias("id"))
            .agg(F.expr("bit_xor(acc)").alias("dx"))
        )
        acc = (
            acc.join(leaves.withColumnRenamed("src", "id"), "id", "left_anti")
            .join(delta, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("dx").isNotNull(),
                    F.col("acc").bitwiseXOR(F.col("dx")),
                )
                .otherwise(F.col("acc"))
                .alias("acc"),
            )
            .localCheckpoint()
        )
        t2 = (
            t2.join(leaves, "src", "left_anti")
            .join(
                leaves.withColumnRenamed("src", "dst"), "dst", "left_anti"
            )
            .select("src", "dst")
            .repartition(npart, "src")
            .localCheckpoint()
        )
    if not t2.isEmpty():
        raise RuntimeError(
            f"bridges: forest not fully peeled in {max_rounds} rounds "
            "(raise max_rounds; radius-bound leaf peeling needs one "
            "round per level)"
        )
    if labeled is None:
        return tree.sparkSession.createDataFrame(
            [], "src long, dst long"
        )
    return (
        labeled.where(F.col("label") == 0)
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
