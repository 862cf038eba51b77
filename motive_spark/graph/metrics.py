"""Whole-graph and per-vertex structural metrics.

Beyond-reference analytics that a link-graph user expects next to the
kernels: local clustering coefficients (triangles over wedges, reusing
the triangle kernel's join plan) and degree assortativity (Pearson
correlation of endpoint degrees — one aggregation, no shuffle beyond
the degree join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from motive_spark.graph.normalize import degrees, undirect
from motive_spark.kernels.triangles import triangles_per_vertex


def local_clustering_coefficients(edges: DataFrame) -> DataFrame:
    """(id, lcc): 2*triangles(v) / (deg(v)*(deg(v)-1)), 0 when deg < 2.

    Triangle counts come from the existing per-vertex triangle kernel
    (sorted-orientation join plan); the wedge denominator is a pure
    expression over the degree table.
    """
    und = undirect(edges)
    tri = triangles_per_vertex(und)
    deg = degrees(und.select("src", "dst"), directed=False)
    # triangles_per_vertex already returns every vertex (0 for none)
    return tri.join(deg, on="id").select(
        "id",
        F.when(
            F.col("deg") >= 2,
            2.0 * F.col("n_triangles") / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row (assortativity): Pearson correlation of the undirected
    degrees at the two endpoints of every edge, both orientations
    counted (the standard Newman r)."""
    und = undirect(edges)
    sym = und.select("src", "dst").unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = degrees(und.select("src", "dst"), directed=False)
    x = deg.select(F.col("id").alias("src"), F.col("deg").alias("dx"))
    y = deg.select(F.col("id").alias("dst"), F.col("deg").alias("dy"))
    pairs = sym.join(x, on="src").join(y, on="dst")
    # Pearson via covariance/stddev with try_divide: a regular graph has
    # zero degree variance, where ANSI-mode corr() raises DIVIDE_BY_ZERO
    # but the conventional (and DuckDB) answer is NULL
    agg = pairs.agg(
        F.covar_samp("dx", "dy").alias("cov"),
        F.stddev_samp("dx").alias("sx"),
        F.stddev_samp("dy").alias("sy"),
    )
    return agg.select(
        F.try_divide(F.col("cov"), F.col("sx") * F.col("sy")).alias(
            "assortativity"
        )
    )


def k_hop_neighborhood(
    edges: DataFrame,
    sources: list[int],
    k: int,
    directed: bool = False,
) -> DataFrame:
    """(source, id, dist): vertices within ``k`` hops of each source,
    with the exact hop distance (BFS levels as k frontier joins — one
    equi-join + min-aggregation per level, lineage truncated per level;
    the ego-network primitive batched over many sources at once)."""
    spark = edges.sparkSession
    if directed:
        e = edges.select("src", "dst")
    else:
        und = undirect(edges)
        e = und.select("src", "dst").unionAll(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.dropDuplicates(["src", "dst"]).cache()

    state = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sorted(set(sources))],
        "source long, id long, dist int",
    )
    for t in range(1, k + 1):
        frontier = state.where(F.col("dist") == t - 1).select(
            "source", F.col("id").alias("src")
        )
        grown = frontier.join(e, on="src").select(
            "source", F.col("dst").alias("id"), F.lit(t).alias("dist")
        )
        state = (
            state.unionByName(grown)
            .groupBy("source", "id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return state


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_vertex: int = 2,
    seed: int = 42,
    directed: bool = False,
) -> DataFrame:
    """Deterministic random walks from every vertex — the node2vec /
    DeepWalk corpus generator for graph-embedding training data.

    Step t of walk (start, widx) picks neighbor index
    ``int(md5(start|widx|t|seed)[:8], 16) mod deg(cur)`` over the
    SORTED neighbor list — md5 is byte-identical cross-engine, so the
    DuckDB oracle replays the exact same walks.  Returns
    (start, widx, path) with path as a '|'-joined id string; walks stop
    early at dead ends (directed graphs only).

    Scale shape: one groupBy builds the adjacency lists (hub rows are
    wide but single — the CSR salting caveat applies); each step is one
    equi-join on the current vertex.  No driver-side anything.
    """
    spark = edges.sparkSession
    if directed:
        sym = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    else:
        und = undirect(edges)
        sym = und.select("src", "dst").unionAll(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    adj = (
        sym.dropDuplicates(["src", "dst"])
        .groupBy("src")
        .agg(
            F.sort_array(F.collect_list("dst")).alias("nbrs"),
            F.count(F.lit(1)).alias("deg"),
        )
        .cache()
    )
    verts = adj.select(F.col("src").alias("start"))
    state = verts.select(
        "start",
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
        ).alias("widx"),
    ).select(
        "start",
        "widx",
        F.col("start").alias("cur"),
        F.array("start").alias("path"),
    )
    for t in range(1, walk_length):
        key = F.concat_ws(
            "|",
            F.col("start").cast("string"),
            F.col("widx").cast("string"),
            F.lit(str(t)),
            F.lit(str(seed)),
        )
        idx = F.pmod(
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"),
            F.col("deg"),
        )
        nxt = F.element_at("nbrs", (idx + 1).cast("int"))
        state = (
            state.join(adj, on=[state.cur == adj.src], how="left")
            .select(
                "start",
                "widx",
                F.coalesce(nxt, F.col("cur")).alias("cur"),
                F.when(nxt.isNotNull(), F.concat("path", F.array(nxt)))
                .otherwise(F.col("path"))
                .alias("path"),
            )
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    return state.select(
        "start",
        "widx",
        F.array_join(F.transform("path", lambda x: x.cast("string")), "|").alias(
            "path"
        ),
    )


def link_prediction_scores(
    edges: DataFrame,
    min_common: int = 1,
    max_middle_degree: int | None = None,
) -> DataFrame:
    """Classic link-prediction scores for every vertex pair with at
    least ``min_common`` common neighbors (u < v):

      common_neighbors  |N(u) ∩ N(v)|
      jaccard           cn / (deg(u) + deg(v) - cn)
      adamic_adar       sum over common w of 1 / ln(deg(w))
      is_edge           whether (u, v) is already an edge

    One wedge self-join on the middle vertex + one aggregation.  Hub
    middles blow up quadratically (deg^2 wedge pairs); at scale pass
    ``max_middle_degree`` to cap them — the standard approximation, and
    the same skew lever the triangle kernel's degree orientation uses.
    """
    und = undirect(edges)
    sym = und.select("src", "dst").unionAll(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = degrees(und.select("src", "dst"), directed=False)
    mid = sym.join(deg.withColumnRenamed("id", "src"), on="src")
    if max_middle_degree is not None:
        mid = mid.where(F.col("deg") <= max_middle_degree)
    a = mid.select(
        F.col("src").alias("w"), F.col("dst").alias("u"), F.col("deg").alias("wdeg")
    )
    b = mid.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    pairs = a.join(b, on="w").where(F.col("u") < F.col("v"))
    scores = pairs.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(1.0 / F.log("wdeg")).alias("adamic_adar"),
    )
    scores = scores.where(F.col("common_neighbors") >= min_common)
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    e_flag = und.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.lit(True).alias("is_edge")
    )
    return (
        scores.join(du, on="u")
        .join(dv, on="v")
        .join(e_flag, on=["u", "v"], how="left")
        .select(
            "u",
            "v",
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("du") + F.col("dv") - F.col("common_neighbors"))
            ).alias("jaccard"),
            "adamic_adar",
            F.coalesce("is_edge", F.lit(False)).alias("is_edge"),
        )
    )
