"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs a motive_spark operator over the driver's
testdata; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL.  The
canonical benchmark graph is the part co-purchase graph (two parts are
linked iff they appear in the same order) — deterministic and identically
derivable in both engines (motive_spark.tables.copurchase_edges).

Float columns are rounded to 6 dp on BOTH sides so the driver's
value-hash compares equal despite summation-order float noise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PR_ITERS = 10
PR_DAMPING = 0.85
LP_ITERS = 4

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB): the co-purchase graph
# ---------------------------------------------------------------------------

SQL_GRAPH = """
li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS MATERIALIZED (
  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
                  CAST(b.l_partkey AS BIGINT) AS dst
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
),
sym AS MATERIALIZED (SELECT src, dst FROM und UNION ALL SELECT dst AS src, src AS dst FROM und),
verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym)
"""


def _pagerank_sql() -> str:
    """Unrolled fixed-iteration damped PageRank with dangling handling —
    byte-for-byte the same update rule as motive_spark.kernels.pagerank."""
    d = PR_DAMPING
    parts = [
        "WITH " + SQL_GRAPH + ",",
        "outdeg AS (SELECT src AS id, COUNT(*) AS od FROM sym GROUP BY src),",
        "base AS MATERIALIZED (SELECT v.id, COALESCE(o.od, 0) AS od FROM verts v "
        "LEFT JOIN outdeg o USING (id)),",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM base),",
        "r0 AS MATERIALIZED (SELECT id, od, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM base)",
    ]
    for i in range(1, PR_ITERS + 1):
        p = f"r{i - 1}"
        parts.append(
            f""",c{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(r.rank / r.od) AS recv
  FROM sym e JOIN {p} r ON e.src = r.id AND r.od > 0
  GROUP BY e.dst
),
r{i} AS MATERIALIZED (
  SELECT b.id, b.od,
         (1.0::DOUBLE - {d}) / (SELECT n FROM nn)
         + {d} * COALESCE(c.recv, 0.0::DOUBLE)
         + {d} * (SELECT COALESCE(SUM(rank), 0.0::DOUBLE) FROM {p} WHERE od = 0)
               / (SELECT n FROM nn) AS rank
  FROM base b LEFT JOIN c{i} c USING (id)
)"""
        )
    parts.append(
        f"\nSELECT id, ROUND(rank, 6) AS rank FROM r{PR_ITERS} ORDER BY id"
    )
    return "\n".join(parts)


def _labelprop_sql() -> str:
    """Unrolled synchronous label propagation, most-frequent-neighbor label,
    ties to the smallest label — same rule as kernels.labelprop."""
    parts = [
        "WITH " + SQL_GRAPH + ",",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM verts)",
    ]
    for i in range(1, LP_ITERS + 1):
        p = f"l{i - 1}"
        parts.append(
            f""",v{i} AS MATERIALIZED (
  SELECT e.src AS id, l.label, COUNT(*) AS cnt
  FROM sym e JOIN {p} l ON e.dst = l.id
  GROUP BY e.src, l.label
),
w{i} AS MATERIALIZED (
  SELECT id, label FROM (
    SELECT id, label,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
    FROM v{i}
  ) WHERE rn = 1
),
l{i} AS MATERIALIZED (
  SELECT v.id, COALESCE(w.label, p.label) AS label
  FROM verts v LEFT JOIN w{i} w USING (id) JOIN {p} p USING (id)
)"""
        )
    parts.append(f"\nSELECT id, label FROM l{LP_ITERS} ORDER BY id")
    return "\n".join(parts)


SQL_COMPONENTS = (
    "WITH RECURSIVE "
    + SQL_GRAPH
    + """,
reach(id, m) AS (
  SELECT src AS id, src AS m FROM sym
  UNION
  SELECT s.dst AS id, r.m FROM sym s JOIN reach r ON s.src = r.id
)
SELECT id, MIN(m) AS component FROM reach GROUP BY id ORDER BY id
"""
)

SQL_TRI = (
    "WITH "
    + SQL_GRAPH
    + """,
tri AS (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM und a
  JOIN und b ON a.src = b.src AND a.dst < b.dst
  JOIN und c ON c.src = a.dst AND c.dst = b.dst
)
"""
)


# ---------------------------------------------------------------------------
# Spark-side helpers
# ---------------------------------------------------------------------------


def _und(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.tables import copurchase_edges

    return copurchase_edges(spark, sf_dir)


def _sym(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.tables import symmetrize

    return symmetrize(_und(spark, sf_dir))


def q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.graph import degrees

    return degrees(_und(spark, sf_dir), directed=False).orderBy("id")


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.graph import degrees

    return (
        degrees(_und(spark, sf_dir), directed=False)
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .orderBy("deg")
    )


def q_edge_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 simplify with multiplicity side channel: co-purchase pair weight =
    number of shared orders (motive Graphs.toSimpleDGraph removal counts)."""
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
    )
    return (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("mult"))
        .where(F.col("mult") >= 2)
        .orderBy("src", "dst")
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.kernels import pagerank

    pr = pagerank(_sym(spark, sf_dir), damping=PR_DAMPING, max_iter=PR_ITERS, tol=None)
    return pr.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.kernels import connected_components

    return connected_components(_und(spark, sf_dir)).orderBy("id")


def q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.kernels import label_propagation

    return label_propagation(_und(spark, sf_dir), iters=LP_ITERS).orderBy("id")


def q_triangle_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.kernels import triangle_count

    return triangle_count(_und(spark, sf_dir))


def q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.kernels import triangles_per_vertex

    return triangles_per_vertex(_und(spark, sf_dir)).orderBy("id")


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank over the sf0.001 co-purchase graph (top ranks)."""
    return q_pagerank(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_degrees": q_degrees,
        "graph_degree_histogram": q_degree_histogram,
        "graph_edge_multiplicity": q_edge_multiplicity,
        "pagerank": q_pagerank,
        "connected_components": q_components,
        "label_propagation": q_labelprop,
        "triangle_count_total": q_triangle_total,
        "triangles_per_vertex": q_triangles_per_vertex,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "graph_degrees": (
            "WITH "
            + SQL_GRAPH
            + """
SELECT id, COUNT(*) AS deg
FROM (SELECT src AS id FROM sym) GROUP BY id ORDER BY id"""
        ),
        "graph_degree_histogram": (
            "WITH "
            + SQL_GRAPH
            + """,
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src)
SELECT deg, COUNT(*) AS n_vertices FROM deg GROUP BY deg ORDER BY deg"""
        ),
        "graph_edge_multiplicity": """
WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT CAST(a.l_partkey AS BIGINT) AS src,
         CAST(b.l_partkey AS BIGINT) AS dst
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
)
SELECT src, dst, COUNT(*) AS mult FROM pairs
GROUP BY src, dst HAVING COUNT(*) >= 2 ORDER BY src, dst""",
        "pagerank": _pagerank_sql(),
        "connected_components": SQL_COMPONENTS,
        "label_propagation": _labelprop_sql(),
        "triangle_count_total": SQL_TRI
        + "SELECT COUNT(*) AS n_triangles FROM tri",
        "triangles_per_vertex": SQL_TRI
        + """,
inc AS (
  SELECT x AS id FROM tri
  UNION ALL SELECT y AS id FROM tri
  UNION ALL SELECT z AS id FROM tri
),
cnt AS (SELECT id, COUNT(*) AS n_triangles FROM inc GROUP BY id)
SELECT v.id, COALESCE(c.n_triangles, 0) AS n_triangles
FROM verts v LEFT JOIN cnt c USING (id) ORDER BY v.id""",
    }
