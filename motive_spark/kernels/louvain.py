"""Louvain-style community refinement: synchronous modularity-gain
moves, integer-exact.

One Louvain "local move" phase (Blondel et al. 2008, public method)
re-expressed for a synchronous distributed engine: every vertex
simultaneously evaluates, against the PREVIOUS round's assignment, the
modularity gain of joining each neighbor community (or re-entering its
own) and adopts the argmax.  Sequential Louvain applies moves one
vertex at a time — unreproducible under distribution — so, like our
label propagation, the kernel is defined as a fixed number of
synchronous rounds: deterministic, order-free, and replayable in ANSI
SQL for the oracle.

The gain of inserting vertex i (removed from its community) into
community C is the standard

    ΔQ = k_iC / m − k_i · Σtot^{-i}(C) / (2 m²)

Multiplying by the positive constant 2m² makes every comparison EXACT
INTEGER arithmetic (no float drift between engines):

    gain2m2(i→C) = 2m·k_iC − k_i·(ktot(C) − k_i·[comm(i)=C])

where k_iC = #edges from i into C, k_i = degree, ktot(C) = Σ degrees
of C's members, and the bracket removes i itself when scoring its own
community.  Ties break to the smallest community id.  BIGINT holds
k_i·ktot up to ~2^63; beyond ~10^9 edges swap the gain expression to
decimal(38,0) / HUGEINT — the comparisons stay exact.

Per-round plan (the north-rule gather-scatter shape): the |V|-row
assignment joins the stationary cached edge table (shuffle-hash — the
edge side never moves), one groupBy (i, C) for k_iC, one groupBy C for
ktot, one struct-max argmax per vertex; lineage truncated every round.

Reference parity: motive has no community detection — this extends the
engine along the same axis as label_propagation (SURVEY §2 J-new).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def louvain_refine(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Returns (id, community) after exactly ``rounds`` synchronous
    gain-max rounds from the singleton partition.  ``edges`` is
    treated as undirected; self-loops dropped, multi-edges deduped."""
    if rounds < 1:
        raise ValueError("louvain_refine: rounds must be >= 1")
    spark = edges.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    sym = (
        edges.select("src", "dst")
        .union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(npart, "dst")
        .cache()
    )
    m2 = sym.count()  # = 2m: every undirected edge counted both ways
    deg = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("k"))
        .cache()
    )

    # the iterated state carries the stationary degree k (guide §2.4):
    # ktot folds straight off the state, k and the own community attach
    # in ONE join, and k rides through the argmax as a group-constant
    # max — 3 joins per round instead of 5, gain arithmetic unchanged
    comm = deg.select("id", "k", F.col("id").alias("comm"))
    for _ in range(rounds):
        ktot = comm.groupBy("comm").agg(F.sum("k").alias("ktot"))
        # k_iC: edges from i into each previous-round community
        nbr = (
            sym.join(
                comm.hint("shuffle_hash").select(
                    F.col("id").alias("_nid"), F.col("comm").alias("cand")
                ),
                sym.dst == F.col("_nid"),
            )
            .groupBy(F.col("src").alias("id"), "cand")
            .agg(F.count(F.lit(1)).alias("kic"))
        )
        # own community is always a candidate (kic 0 row merges by sum)
        cand = nbr.unionByName(
            comm.select(
                "id", F.col("comm").alias("cand"), F.lit(0).alias("kic")
            )
        )
        scored = (
            cand.groupBy("id", "cand")
            .agg(F.sum("kic").alias("kic"))
            .join(
                comm.select("id", "k", F.col("comm").alias("own")), "id"
            )
            .join(
                ktot.select(F.col("comm").alias("cand"), "ktot"), "cand"
            )
            .select(
                "id",
                "cand",
                "k",
                (
                    F.lit(m2) * F.col("kic")
                    - F.col("k")
                    * (
                        F.col("ktot")
                        - F.when(
                            F.col("own") == F.col("cand"), F.col("k")
                        ).otherwise(F.lit(0))
                    )
                ).alias("gain"),
            )
        )
        comm = (
            scored.groupBy("id")
            .agg(
                F.max(
                    F.struct(
                        F.col("gain"), (-F.col("cand")).alias("neg")
                    )
                ).alias("top"),
                F.max("k").alias("k"),  # constant within the group
            )
            .select("id", "k", (-F.col("top.neg")).alias("comm"))
            .repartition(npart, "id")
            .localCheckpoint()  # truncate lineage every round
        )
    sym.unpersist()
    deg.unpersist()
    return comm.select("id", F.col("comm").alias("community"))


def contract_graph(
    edges: DataFrame, assignment: DataFrame, keep_self_loops: bool = True
) -> DataFrame:
    """Coarsen a graph by a vertex→community assignment (the Louvain
    level-2 / multilevel-partitioning primitive): every edge maps to
    its endpoint communities and parallel edges collapse into an
    integer weight.  Returns canonical (src, dst, w) with src <= dst;
    ``keep_self_loops`` retains intra-community edges as self-loops
    (their weight is the community's internal edge count — what a
    weighted second Louvain level consumes).

    Plan: two joins of the edge list against the (id, community)
    table (shuffle on id — the edge side can stay put when assignment
    is broadcastable) + one map-side-combinable groupBy.  Coarsening
    typically shrinks |V| by orders of magnitude, so downstream levels
    run on broadcast-size graphs.
    """
    amap = assignment.select(
        F.col("id").alias("_aid"), F.col("community").alias("_c")
    )
    mapped = (
        edges.select("src", "dst")
        .join(amap.withColumnRenamed("_aid", "src"), "src")
        .withColumnRenamed("_c", "_cs")
        .join(amap.withColumnRenamed("_aid", "dst"), "dst")
        .withColumnRenamed("_c", "_cd")
        .select(
            F.least("_cs", "_cd").alias("src"),
            F.greatest("_cs", "_cd").alias("dst"),
        )
    )
    if not keep_self_loops:
        mapped = mapped.where(F.col("src") != F.col("dst"))
    return mapped.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("w")
    )


def louvain_refine_weighted(
    edges_w: DataFrame, rounds: int = 3
) -> DataFrame:
    """Weighted synchronous Louvain local moves over a canonical
    (src <= dst, w) edge list — the LEVEL-2 consumer of
    ``contract_graph``: self-loops carry intra-community mass (a
    self-loop of weight w adds 2w to its vertex's weighted degree and
    never contributes to k_iC), and the same integer 2m²-scaled gain
    decides every move exactly."""
    if rounds < 1:
        raise ValueError("louvain_refine_weighted: rounds must be >= 1")
    spark = edges_w.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))

    base = edges_w.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.col("w").cast("long").alias("w"),
    ).groupBy("src", "dst").agg(F.sum("w").alias("w")).cache()
    csym = (
        base.where(F.col("src") != F.col("dst"))
        .unionByName(
            base.where(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
        .repartition(npart, "dst")
        .cache()
    )
    deg = (
        csym.select(F.col("src").alias("id"), "w")
        .unionByName(
            base.where(F.col("src") == F.col("dst")).select(
                F.col("src").alias("id"), (F.col("w") * 2).alias("w")
            )
        )
        .groupBy("id")
        .agg(F.sum("w").alias("k"))
        .cache()
    )
    m2 = deg.agg(F.sum("k")).collect()[0][0] or 0

    # same state-carried-degree round body as louvain_refine (3 joins
    # per round instead of 5; weighted kic, identical gain arithmetic)
    comm = deg.select("id", "k", F.col("id").alias("comm"))
    for _ in range(rounds):
        ktot = comm.groupBy("comm").agg(F.sum("k").alias("ktot"))
        nbr = (
            csym.join(
                comm.hint("shuffle_hash").select(
                    F.col("id").alias("_nid"), F.col("comm").alias("cand")
                ),
                csym.dst == F.col("_nid"),
            )
            .groupBy(F.col("src").alias("id"), "cand")
            .agg(F.sum("w").alias("kic"))
        )
        cand = nbr.unionByName(
            comm.select(
                "id", F.col("comm").alias("cand"), F.lit(0).alias("kic")
            )
        )
        scored = (
            cand.groupBy("id", "cand")
            .agg(F.sum("kic").alias("kic"))
            .join(
                comm.select("id", "k", F.col("comm").alias("own")), "id"
            )
            .join(ktot.select(F.col("comm").alias("cand"), "ktot"), "cand")
            .select(
                "id",
                "cand",
                "k",
                (
                    F.lit(m2) * F.col("kic")
                    - F.col("k")
                    * (
                        F.col("ktot")
                        - F.when(
                            F.col("own") == F.col("cand"), F.col("k")
                        ).otherwise(F.lit(0))
                    )
                ).alias("gain"),
            )
        )
        comm = (
            scored.groupBy("id")
            .agg(
                F.max(
                    F.struct(F.col("gain"), (-F.col("cand")).alias("neg"))
                ).alias("top"),
                F.max("k").alias("k"),  # constant within the group
            )
            .select("id", "k", (-F.col("top.neg")).alias("comm"))
            .repartition(npart, "id")
            .localCheckpoint()
        )
    base.unpersist()
    csym.unpersist()
    deg.unpersist()
    return comm.select("id", F.col("comm").alias("community"))


def louvain_multilevel(
    edges: DataFrame, rounds1: int = 3, rounds2: int = 3
) -> DataFrame:
    """Two Louvain levels: refine on the raw graph, contract by the
    level-1 assignment (intra mass → self-loops), refine the WEIGHTED
    coarse graph, map every vertex to its supernode's final community.
    The coarse graph is typically orders of magnitude smaller, so the
    second level costs a fraction of the first — the full Blondel
    multilevel shape, deterministic at every step."""
    edges = edges.select("src", "dst").cache()  # level-1 + contraction reuse
    l1 = louvain_refine(edges, rounds=rounds1)
    coarse = contract_graph(edges, l1)
    l2 = louvain_refine_weighted(coarse, rounds=rounds2)
    out = (
        l1.join(
            l2.select(
                F.col("id").alias("community"),
                F.col("community").alias("_c2"),
            ),
            "community",
        )
        .select("id", F.col("_c2").alias("community"))
    )
    # both refine results are already backed by their final per-round
    # localCheckpoints (eager), and l2's materialization inside
    # louvain_refine_weighted consumed the coarse graph — so the edge
    # cache has served both readers and can be released NOW instead of
    # leaking an |E|-scale cache past the call (r6 review finding)
    edges.unpersist()
    return out
