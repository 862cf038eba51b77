"""Triangle counting via degree-ordered two-hop join (north_rule kernel).

Algorithm (exact, standard MapReduce formulation): orient each
undirected edge from the lower-rank endpoint to the higher-rank one,
where rank = (degree, id) — every triangle is then counted exactly once
as a directed wedge a→b, a→c (rank a < b < c-wise ordering not required;
orientation alone suffices) closed by edge b→c.

The degree ordering is the scale trick: a hub of degree D gets out-degree
at most ~sqrt(m) after orientation, so the wedge self-join never explodes
on skewed graphs (Suri & Vassilvitskii, WWW'11 — public literature).
Total count is orientation-invariant, so the DuckDB oracle can use plain
id ordering and still match exactly.

Pure DataFrame ops: two joins + aggregations, no iteration, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame, by_degree: bool) -> DataFrame:
    """Orient undirected edges low-rank → high-rank; returns (lo, hi)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    if not by_degree:
        return und.select(F.col("a").alias("lo"), F.col("b").alias("hi"))
    deg = (
        und.select(F.col("a").alias("id"))
        .union(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        und.join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "deg_a"), on="a")
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "deg_b"), on="b")
    )
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def _triangle_rows(edges: DataFrame, by_degree: bool) -> DataFrame:
    """One row (x, y, z) per triangle (vertex order arbitrary)."""
    o = _oriented(edges, by_degree).cache()
    w1 = o.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    w2 = o.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    wedges = w1.join(w2, on="a").where(F.col("b") < F.col("c"))
    # close the wedge with an edge b-c in either orientation
    closer = o.select(
        F.least("lo", "hi").alias("b"), F.greatest("lo", "hi").alias("c")
    )
    return wedges.join(closer, on=["b", "c"]).select(
        F.col("a").alias("x"), F.col("b").alias("y"), F.col("c").alias("z")
    )


def triangle_count(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """Single-row DataFrame (n_triangles: long) — total distinct triangles."""
    return _triangle_rows(edges, by_degree).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def triangles_per_vertex(edges: DataFrame, by_degree: bool = True) -> DataFrame:
    """(id, n_triangles) — triangles incident to each vertex; vertices in
    no triangle get 0 (exact-match contract at convergence)."""
    tri = _triangle_rows(edges, by_degree)
    exploded = (
        tri.select(F.col("x").alias("id"))
        .union(tri.select(F.col("y").alias("id")))
        .union(tri.select(F.col("z").alias("id")))
    )
    counts = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return verts.join(counts, on="id", how="left").select(
        "id", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )
