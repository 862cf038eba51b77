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

from pyspark.sql import DataFrame, SparkSession, Window
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


def _modularity_sql() -> str:
    """Label-propagation communities (the unrolled LP oracle) fed into
    the per-community modularity decomposition — float terms are pure
    per-row expressions of exact integers (x*x, not pow)."""
    lp = _labelprop_sql()
    body = lp[: lp.rindex("\nSELECT id, label")]
    return (
        body
        + f""",
lab AS MATERIALIZED (SELECT id, label AS community FROM l{LP_ITERS}),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
mm AS (SELECT COUNT(*) AS m FROM und),
dc AS (
  SELECT community, COUNT(*) AS n_nodes, SUM(deg) AS deg_sum
  FROM lab JOIN deg USING (id) GROUP BY community
),
ein AS (
  SELECT a.community, COUNT(*) AS e_in
  FROM und e JOIN lab a ON e.src = a.id JOIN lab b ON e.dst = b.id
  WHERE a.community = b.community GROUP BY a.community
)
SELECT d.community, d.n_nodes, CAST(d.deg_sum AS BIGINT) AS deg_sum,
       CAST(COALESCE(i.e_in, 0) AS BIGINT) AS e_in,
       ROUND(
         COALESCE(i.e_in, 0) / (SELECT CAST(m AS DOUBLE) FROM mm)
         - (d.deg_sum / (2.0 * (SELECT m FROM mm)))
           * (d.deg_sum / (2.0 * (SELECT m FROM mm))),
         6
       ) AS q_contrib
FROM dc d LEFT JOIN ein i USING (community) ORDER BY d.community"""
    )


COLOR_ROUNDS = 6
COLOR_SEED = 11


def _coloring_sql() -> str:
    """Unrolled deterministic Jones–Plassmann rounds: md5*2^31+id
    priorities, strict-max winners, smallest free color via
    range-unnest anti-join — the same relational formulation as the
    kernel, replayed exactly."""
    parts = [
        "WITH " + SQL_GRAPH + f""",
s0 AS MATERIALIZED (
  SELECT id,
         ('0x' || substr(md5(id || '|{COLOR_SEED}'), 1, 8))::BIGINT
           * 2147483648 + id AS pri,
         CAST(NULL AS BIGINT) AS color
  FROM verts
)"""
    ]
    for t in range(1, COLOR_ROUNDS + 1):
        p = f"s{t - 1}"
        parts.append(
            f""",u{t} AS MATERIALIZED (SELECT id, pri FROM {p} WHERE color IS NULL),
n{t} AS (
  SELECT e.src, MAX(b.pri) AS mx
  FROM sym e JOIN u{t} a ON e.src = a.id JOIN u{t} b ON e.dst = b.id
  GROUP BY e.src
),
w{t} AS MATERIALIZED (
  SELECT a.id FROM u{t} a LEFT JOIN n{t} n ON n.src = a.id
  WHERE n.src IS NULL OR a.pri > n.mx
),
us{t} AS MATERIALIZED (
  SELECT DISTINCT e.src AS id, c.color AS ncolor
  FROM w{t} v JOIN sym e ON e.src = v.id
  JOIN {p} c ON c.id = e.dst AND c.color IS NOT NULL
),
nu{t} AS (SELECT id, COUNT(*) AS n_used FROM us{t} GROUP BY id),
cd{t} AS (
  SELECT id, UNNEST(range(0, COALESCE(n_used, 0) + 1)) AS c
  FROM w{t} LEFT JOIN nu{t} USING (id)
),
f{t} AS (
  SELECT c.id, MIN(c.c) AS new_color
  FROM cd{t} c LEFT JOIN us{t} u ON u.id = c.id AND u.ncolor = c.c
  WHERE u.id IS NULL GROUP BY c.id
),
s{t} AS MATERIALIZED (
  SELECT s.id, s.pri, COALESCE(s.color, f.new_color) AS color
  FROM {p} s LEFT JOIN f{t} f USING (id)
)"""
        )
    parts.append(
        f"\nSELECT id, color FROM s{COLOR_ROUNDS} ORDER BY id"
    )
    return "".join(parts)


def _ppr_sql(n_seeds: int = 5) -> str:
    """Unrolled personalized PageRank over the DIRECTED src<dst
    co-purchase orientation, restart mass on the n_seeds smallest ids —
    byte-for-byte the update rule of kernels.personalized_pagerank."""
    d = PR_DAMPING
    parts = [
        "WITH " + SQL_GRAPH + ",",
        "outdeg AS (SELECT src AS id, COUNT(*) AS od FROM und GROUP BY src),",
        f"seeds AS MATERIALIZED (SELECT id FROM verts ORDER BY id LIMIT {n_seeds}),",
        "base AS MATERIALIZED (SELECT v.id, COALESCE(o.od, 0) AS od, "
        f"CASE WHEN v.id IN (SELECT id FROM seeds) THEN 1.0::DOUBLE / {n_seeds} "
        "ELSE 0.0::DOUBLE END AS s "
        "FROM verts v LEFT JOIN outdeg o USING (id)),",
        "p0 AS MATERIALIZED (SELECT id, od, s, s AS rank FROM base)",
    ]
    for i in range(1, PR_ITERS + 1):
        p = f"p{i - 1}"
        parts.append(
            f""",pc{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(r.rank / r.od) AS recv
  FROM und e JOIN {p} r ON e.src = r.id AND r.od > 0
  GROUP BY e.dst
),
p{i} AS MATERIALIZED (
  SELECT b.id, b.od, b.s,
         (1.0::DOUBLE - {d}) * b.s
         + {d} * COALESCE(c.recv, 0.0::DOUBLE)
         + {d} * (SELECT COALESCE(SUM(rank), 0.0::DOUBLE) FROM {p} WHERE od = 0)
               * b.s AS rank
  FROM base b LEFT JOIN pc{i} c USING (id)
)"""
        )
    parts.append(
        f"\nSELECT id, ROUND(rank, 6) AS rank FROM p{PR_ITERS} ORDER BY id"
    )
    return "\n".join(parts)


def _hits_sql(iters: int = 8) -> str:
    """Unrolled L1-normalized HITS over the directed src<dst orientation
    — the same superstep as kernels.hits."""
    parts = [
        "WITH " + SQL_GRAPH + ",",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),",
        "s0 AS MATERIALIZED (SELECT id, 1.0 / (SELECT n FROM nn) AS hub, "
        "1.0 / (SELECT n FROM nn) AS auth FROM verts)",
    ]
    for i in range(1, iters + 1):
        p = f"s{i - 1}"
        parts.append(
            f""",ra{i} AS MATERIALIZED (
  SELECT v.id, COALESCE(x.r, 0.0::DOUBLE) AS raw
  FROM verts v LEFT JOIN (
    SELECT e.dst AS id, SUM(h.hub) AS r
    FROM und e JOIN {p} h ON e.src = h.id GROUP BY e.dst
  ) x USING (id)
),
a{i} AS MATERIALIZED (
  SELECT id, raw / (SELECT CASE WHEN SUM(raw) = 0 THEN 1.0 ELSE SUM(raw) END
                    FROM ra{i}) AS auth
  FROM ra{i}
),
rh{i} AS MATERIALIZED (
  SELECT v.id, COALESCE(x.r, 0.0::DOUBLE) AS raw
  FROM verts v LEFT JOIN (
    SELECT e.src AS id, SUM(a.auth) AS r
    FROM und e JOIN a{i} a ON e.dst = a.id GROUP BY e.src
  ) x USING (id)
),
s{i} AS MATERIALIZED (
  SELECT h.id,
         h.raw / (SELECT CASE WHEN SUM(raw) = 0 THEN 1.0 ELSE SUM(raw) END
                  FROM rh{i}) AS hub,
         a.auth
  FROM rh{i} h JOIN a{i} a USING (id)
)"""
        )
    parts.append(
        f"\nSELECT id, ROUND(hub, 6) AS hub, ROUND(auth, 6) AS auth "
        f"FROM s{iters} ORDER BY id"
    )
    return "\n".join(parts)


def _kcore_sql(k: int = 3, rounds: int = 8) -> str:
    """Unrolled k-core peel: ``rounds`` edge-filter rounds, then the
    vertices with deg >= k in the final graph — exactly
    kernels.k_core(..., max_rounds=rounds)."""
    parts = ["WITH " + SQL_GRAPH + ",", "a0 AS MATERIALIZED (SELECT src, dst FROM und)"]
    for i in range(1, rounds + 1):
        p = f"a{i - 1}"
        parts.append(
            f""",d{i} AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT src AS id FROM {p} UNION ALL SELECT dst FROM {p}
  ) GROUP BY id
),
k{i} AS MATERIALIZED (SELECT id FROM d{i} WHERE deg >= {k}),
a{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {p} e
  JOIN k{i} x ON e.src = x.id JOIN k{i} y ON e.dst = y.id
)"""
        )
    parts.append(
        f"""
SELECT id FROM (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT src AS id FROM a{rounds} UNION ALL SELECT dst FROM a{rounds}
  ) GROUP BY id
) WHERE deg >= {k} ORDER BY id"""
    )
    return "\n".join(parts)


def _weighted_pr_sql() -> str:
    """Unrolled weighted PageRank (multiplicity-weighted co-purchase)."""
    d = PR_DAMPING
    parts = [
        """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
wund AS MATERIALIZED (
  SELECT CAST(a.l_partkey AS BIGINT) AS src, CAST(b.l_partkey AS BIGINT) AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2
),
wsym AS MATERIALIZED (
  SELECT src, dst, w FROM wund
  UNION ALL SELECT dst AS src, src AS dst, w FROM wund
),
wverts AS MATERIALIZED (SELECT DISTINCT src AS id FROM wsym),
wout AS (SELECT src AS id, SUM(w) AS w_out FROM wsym GROUP BY src),
wbase AS MATERIALIZED (
  SELECT v.id, COALESCE(o.w_out, 0.0) AS w_out
  FROM wverts v LEFT JOIN wout o USING (id)),
wn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM wbase),
w0 AS MATERIALIZED (
  SELECT id, w_out, 1.0::DOUBLE / (SELECT n FROM wn) AS rank FROM wbase)""",
    ]
    for i in range(1, PR_ITERS + 1):
        p = f"w{i - 1}"
        parts.append(
            f""",wc{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(r.rank * e.w / r.w_out) AS recv
  FROM wsym e JOIN {p} r ON e.src = r.id AND r.w_out > 0
  GROUP BY e.dst
),
w{i} AS MATERIALIZED (
  SELECT b.id, b.w_out,
         (1.0::DOUBLE - {d}) / (SELECT n FROM wn)
         + {d} * COALESCE(c.recv, 0.0::DOUBLE)
         + {d} * (SELECT COALESCE(SUM(rank), 0.0::DOUBLE) FROM {p} WHERE w_out = 0)
               / (SELECT n FROM wn) AS rank
  FROM wbase b LEFT JOIN wc{i} c USING (id)
)"""
        )
    parts.append(
        f"\nSELECT id, ROUND(rank, 6) AS rank FROM w{PR_ITERS} ORDER BY id"
    )
    return "\n".join(parts)


def _seeded_lp_sql() -> str:
    """Unrolled seeded (clamped) label propagation — same rule as
    kernels.seeded_label_propagation."""
    parts = [
        "WITH " + SQL_GRAPH + ",",
        """seeds AS MATERIALIZED (
  SELECT id, id % 2 AS seed_label FROM (SELECT id FROM verts ORDER BY id LIMIT 4)),
t0 AS MATERIALIZED (
  SELECT v.id, s.seed_label AS label FROM verts v LEFT JOIN seeds s USING (id))""",
    ]
    for i in range(1, LP_ITERS + 1):
        p = f"t{i - 1}"
        parts.append(
            f""",sv{i} AS MATERIALIZED (
  SELECT e.src AS id, l.label, COUNT(*) AS cnt
  FROM sym e JOIN {p} l ON e.dst = l.id
  WHERE l.label IS NOT NULL
  GROUP BY e.src, l.label
),
sw{i} AS MATERIALIZED (
  SELECT id, label AS win FROM (
    SELECT id, label,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
    FROM sv{i}
  ) WHERE rn = 1
),
t{i} AS MATERIALIZED (
  SELECT v.id, COALESCE(s.seed_label, w.win, o.label) AS label
  FROM verts v
  LEFT JOIN seeds s USING (id)
  LEFT JOIN sw{i} w USING (id)
  LEFT JOIN {p} o USING (id)
)"""
        )
    parts.append(f"\nSELECT id, label FROM t{LP_ITERS} ORDER BY id")
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


def q_pagerank_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline CSR single-exchange plan, driver-gated against the
    SAME DuckDB oracle as the default strategy — the scaling-winning
    physical plan is exactly as correct as the reference iteration."""
    from motive_spark.kernels import pagerank

    pr = pagerank(
        _sym(spark, sf_dir), damping=PR_DAMPING, max_iter=PR_ITERS, tol=None,
        strategy="csr",
    )
    return pr.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


PPR_SEEDS = 5


def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the co-purchase graph treated as a
    DIRECTED src->dst table (canonical src<dst orientation), restart
    mass on the 5 smallest vertex ids."""
    from motive_spark.graph import vertices
    from motive_spark.kernels import personalized_pagerank

    und = _und(spark, sf_dir).cache()  # one co-purchase derivation for
    # both the seed pick and the kernel's own edge cache
    seeds = [
        int(r["id"])
        for r in vertices(und).orderBy("id").limit(PPR_SEEDS).collect()
    ]
    pr = personalized_pagerank(
        und, seeds, damping=PR_DAMPING, max_iter=PR_ITERS, tol=None
    )
    return pr.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (L1-normalized, 8 supersteps) over the
    directed src<dst co-purchase orientation."""
    from motive_spark.kernels import hits

    h = hits(_und(spark, sf_dir), max_iter=8)
    return h.select(
        "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
    ).orderBy("id")


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80-core of the co-purchase graph (dense: lower k peels nothing),
    8 fixed peel rounds, unrolled identically in the oracle; the
    fixpoint variant is pytest-gated."""
    from motive_spark.kernels import k_core

    return k_core(_und(spark, sf_dir), 80, max_rounds=8).orderBy("id")


def q_graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC over the DIRECTED part-succession graph (part a -> part b iff
    b follows a as the next linenumber of some order) — nontrivial
    cycles appear across orders.  Oracle = exact mutual reachability via
    a recursive closure; both sides label by the SCC's min vertex id."""
    from motive_spark.kernels import strongly_connected_components

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    d = (
        a.join(
            b,
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1,
            ],
        )
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .dropDuplicates()
    )
    return strongly_connected_components(d).orderBy("id")


def q_graph_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient (triangles over wedges)."""
    from motive_spark.graph import local_clustering_coefficients

    lcc = local_clustering_coefficients(_und(spark, sf_dir))
    return lcc.select("id", F.round("lcc", 6).alias("lcc")).orderBy("id")


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity (one row)."""
    from motive_spark.graph import degree_assortativity

    r = degree_assortativity(_und(spark, sf_dir))
    return r.select(F.round("assortativity", 6).alias("assortativity"))


def q_graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop ego networks of the 3 smallest vertices with exact BFS
    distances (batched multi-source frontier joins)."""
    from motive_spark.graph import k_hop_neighborhood, vertices

    und = _und(spark, sf_dir).cache()
    seeds = [
        int(r["id"]) for r in vertices(und).orderBy("id").limit(3).collect()
    ]
    return k_hop_neighborhood(und, seeds, 2, directed=False).orderBy(
        "source", "id"
    )


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the symmetric co-purchase graph with the
    P1 multiplicity side channel as edge weight (co-occurrence count)."""
    from motive_spark.kernels import weighted_pagerank

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    a, b = li.alias("a"), li.alias("b")
    wund = (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("mult"))
    )
    wsym = wund.unionByName(
        wund.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "mult"
        )
    )
    pr = weighted_pagerank(
        wsym, damping=PR_DAMPING, max_iter=PR_ITERS, tol=None
    )
    return pr.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


def q_text_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule document filter values + pass booleans."""
    from motive_spark.datapipe import gopher_quality_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_quality_filter(docs).orderBy("doc_id")


def q_graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source WEIGHTED shortest paths (frontier Bellman-Ford, 6
    fixed synchronous rounds, integer co-purchase-multiplicity weights)
    from the 3 smallest vertices — the oracle unrolls the identical
    relaxation recurrence, so distances compare exactly."""
    from motive_spark.kernels import shortest_paths

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    a, b = li.alias("a"), li.alias("b")
    wund = (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("mult"))
        # within-query cache: the sources collect below and the kernel
        # both consume wund -- one lineitem self-join instead of two
        .cache()
    )
    verts = wund.select(F.col("src").alias("id")).union(
        wund.select(F.col("dst").alias("id"))
    ).distinct()
    sources = [r.id for r in verts.orderBy("id").limit(3).collect()]
    return shortest_paths(
        wund, sources, weight_col="mult", rounds=6
    ).orderBy("source", "id")


NEG_K = 4
NEG_SEED = 23


def q_graph_neighbor_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GNN-style single-layer neighborhood aggregation: per vertex of
    the co-purchase graph, count/sum/min/max of neighbors' retail
    price (integer cents) and size — exact integer sums both engines
    replay."""
    from motive_spark.graph import neighbor_feature_agg

    und = _und(spark, sf_dir)
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").cast("long").alias("id"),
        F.round(F.col("p_retailprice") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    return neighbor_feature_agg(
        und, part, feature_cols=["price_cents", "size"]
    ).orderBy("id")


_NEIGHBOR_FEATURES_SQL = (
    "WITH "
    + SQL_GRAPH
    + """,
feat AS MATERIALIZED (
  SELECT CAST(p_partkey AS BIGINT) AS dst,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
)
SELECT e.src AS id, COUNT(*) AS n_nbrs,
       CAST(SUM(f.price_cents) AS BIGINT) AS sum_price_cents,
       MIN(f.price_cents) AS min_price_cents,
       MAX(f.price_cents) AS max_price_cents,
       CAST(SUM(f.size) AS BIGINT) AS sum_size,
       MIN(f.size) AS min_size, MAX(f.size) AS max_size
FROM sym e JOIN feat f ON f.dst = e.dst
GROUP BY e.src ORDER BY id"""
)


def q_graph_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-edge sampling (k=4 md5-derived trials
    per vertex, rejection of self-pairs and existing edges) — the
    link-prediction training-set complement; the oracle regenerates
    every surviving pair from the same md5 ranks."""
    from motive_spark.graph import negative_samples

    und = _und(spark, sf_dir)
    return negative_samples(und, k=NEG_K, seed=NEG_SEED).orderBy(
        "src", "dst", "trial"
    )


_NEGATIVE_SAMPLES_SQL = (
    "WITH "
    + SQL_GRAPH
    + f""",
n AS (SELECT COUNT(*) AS n FROM verts),
ranked AS MATERIALIZED (
  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS rank FROM verts
),
cand AS (
  SELECT v.id AS src, t.trial,
         ('0x' || substr(md5(v.id || '|' || t.trial || '|{NEG_SEED}'),
                         1, 14))::BIGINT % (SELECT n FROM n) AS rank
  FROM verts v, (SELECT UNNEST(range(1, {NEG_K} + 1)) AS trial) t
)
SELECT c.src, r.id AS dst, c.trial
FROM cand c JOIN ranked r USING (rank)
WHERE c.src <> r.id
  AND NOT EXISTS (SELECT 1 FROM sym s
                  WHERE s.src = c.src AND s.dst = r.id)
ORDER BY c.src, dst, c.trial"""
)


def q_graph_sssp_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-stepping (delta=2) to convergence on the same weighted
    graph and sources as graph_sssp — converged distances are exactly
    Dijkstra's, and the oracle's 8 unrolled Bellman-Ford rounds are
    past fixpoint at this SF (measured convergence: 3 effective
    rounds), so the two schedules must hash-match."""
    from motive_spark.kernels import delta_stepping

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    a, b = li.alias("a"), li.alias("b")
    wund = (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("mult"))
        # within-query cache: the sources collect below and the kernel
        # both consume wund -- one lineitem self-join instead of two
        .cache()
    )
    verts = wund.select(F.col("src").alias("id")).union(
        wund.select(F.col("dst").alias("id"))
    ).distinct()
    sources = [r.id for r in verts.orderBy("id").limit(3).collect()]
    return delta_stepping(
        wund, sources, delta=2, weight_col="mult"
    ).orderBy("source", "id")


def _sssp_sql(rounds: int = 6) -> str:
    parts = [
        """WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
wund AS MATERIALIZED (
  SELECT CAST(a.l_partkey AS BIGINT) AS src, CAST(b.l_partkey AS BIGINT) AS dst,
         COUNT(*) AS w
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2
),
wsym AS MATERIALIZED (
  SELECT src, dst, w FROM wund
  UNION ALL SELECT dst AS src, src AS dst, w FROM wund
),
verts AS (SELECT DISTINCT src AS id FROM wsym),
seeds AS (SELECT id FROM verts ORDER BY id LIMIT 3),
d0 AS MATERIALIZED (SELECT id AS source, id, CAST(0 AS BIGINT) AS dist FROM seeds)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",d{r} AS MATERIALIZED (
  SELECT source, id, MIN(dist) AS dist FROM (
    SELECT source, id, dist FROM d{r - 1}
    UNION ALL
    SELECT p.source, e.dst AS id, p.dist + e.w AS dist
    FROM d{r - 1} p JOIN wsym e ON e.src = p.id
  ) GROUP BY source, id
)"""
        )
    parts.append(
        f"\nSELECT source, id, CAST(dist AS BIGINT) AS dist"
        f" FROM d{rounds} ORDER BY source, id"
    )
    return "".join(parts)


def q_graph_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled harmonic centrality from the 8 smallest vertices (6 BFS
    rounds); contributions quantized to integers before the sum, so the
    aggregation is order-independent and exact."""
    from motive_spark.graph import vertices
    from motive_spark.kernels import harmonic_centrality

    # within-query cache: the source collect and the kernel both read und
    und = _und(spark, sf_dir).cache()
    srcs = [r.id for r in vertices(und).orderBy("id").limit(8).collect()]
    return harmonic_centrality(und, srcs, rounds=6).orderBy("id")


def _harmonic_sql(rounds: int = 6, n_sources: int = 8) -> str:
    parts = [
        "WITH "
        + SQL_GRAPH
        + f""",
seeds AS (SELECT id FROM verts ORDER BY id LIMIT {n_sources}),
d0 AS MATERIALIZED (SELECT id AS source, id, CAST(0 AS BIGINT) AS dist FROM seeds)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",d{r} AS MATERIALIZED (
  SELECT source, id, MIN(dist) AS dist FROM (
    SELECT source, id, dist FROM d{r - 1}
    UNION ALL
    SELECT p.source, e.dst AS id, p.dist + 1 AS dist
    FROM d{r - 1} p JOIN sym e ON e.src = p.id
  ) GROUP BY source, id
)"""
        )
    parts.append(
        f"""
SELECT id,
       CAST(SUM(CAST(round(1000000.0 / dist) AS BIGINT)) AS BIGINT)
         AS harmonic_x1e6,
       COUNT(*) AS n_reached
FROM d{rounds} WHERE dist > 0 GROUP BY id ORDER BY id"""
    )
    return "".join(parts)


def q_graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 4-step random walks, 2 per vertex, md5-indexed
    neighbor choice — the DuckDB oracle replays the identical walks."""
    from motive_spark.graph import random_walks

    return random_walks(
        _und(spark, sf_dir), walk_length=4, walks_per_vertex=2, seed=7
    ).orderBy("start", "widx")


def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community Newman modularity of the label-propagation
    partition (4 synchronous rounds) — community quality scoring over
    the kernel output; float terms are per-row expressions of exact
    integers, so the oracle matches bit-for-bit."""
    from motive_spark.graph import community_modularity
    from motive_spark.kernels import label_propagation

    und = _und(spark, sf_dir).cache()
    labels = label_propagation(und, iters=LP_ITERS)
    return community_modularity(und, labels).orderBy("community")


def q_graph_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Jones–Plassmann greedy coloring, 6 rounds —
    md5-priority strict-max winners take the smallest free color;
    vertices not yet reached stay NULL (fixed-round contract, same
    convention as seeded LP)."""
    from motive_spark.kernels import greedy_coloring

    return greedy_coloring(
        _und(spark, sf_dir), rounds=COLOR_ROUNDS, seed=COLOR_SEED
    ).orderBy("id")


BC_N_SOURCES = 4
BC_DEPTH = 4
BC_SCALE = 100_000


def q_graph_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled bounded-horizon Brandes betweenness from the 4 smallest
    vertices, 4-hop horizon; dependencies quantized to integer 1e-5
    units with floor division, so every sum is an exact integer and
    the unrolled oracle replays the accumulation bit-for-bit."""
    from motive_spark.kernels import betweenness_sampled

    # within-query cache: the source collect and the kernel both read und
    und = _und(spark, sf_dir).cache()
    verts = und.select(F.col("src").alias("id")).union(
        und.select(F.col("dst").alias("id"))
    ).distinct()
    sources = [r.id for r in verts.orderBy("id").limit(BC_N_SOURCES).collect()]
    return betweenness_sampled(
        und, sources, depth=BC_DEPTH, scale=BC_SCALE
    ).orderBy("id")


def _betweenness_sql(
    n_sources: int = BC_N_SOURCES,
    depth: int = BC_DEPTH,
    scale: int = BC_SCALE,
) -> str:
    """Unrolled forward BFS with path counting + Brandes backward
    accumulation in integer 1/scale units (// = floor division on
    positive BIGINTs = Spark DIV)."""
    parts = [
        "WITH "
        + SQL_GRAPH
        + f""",
srcs AS MATERIALIZED (SELECT id FROM verts ORDER BY id LIMIT {n_sources}),
s0 AS MATERIALIZED (
  SELECT id AS source, id, 0 AS dist, CAST(1 AS BIGINT) AS sigma FROM srcs
),
f0 AS MATERIALIZED (SELECT * FROM s0)"""
    ]
    for l in range(1, depth + 1):
        parts.append(
            f""",
c{l} AS (
  SELECT f.source, e.dst AS id, CAST(SUM(f.sigma) AS BIGINT) AS sigma
  FROM f{l - 1} f JOIN sym e ON e.src = f.id
  GROUP BY f.source, e.dst
),
f{l} AS MATERIALIZED (
  SELECT c.source, c.id, {l} AS dist, c.sigma
  FROM c{l} c LEFT JOIN s{l - 1} s ON s.source = c.source AND s.id = c.id
  WHERE s.id IS NULL
),
s{l} AS MATERIALIZED (
  SELECT * FROM s{l - 1} UNION ALL SELECT * FROM f{l}
)"""
        )
    # backward: levels depth-1 .. 1; deepest level has delta 0
    prev_d = None
    for l in range(depth - 1, 0, -1):
        dterm = (
            "0"
            if prev_d is None
            else f"COALESCE(dd.delta, 0)"
        )
        djoin = (
            ""
            if prev_d is None
            else f"\n  LEFT JOIN {prev_d} dd ON dd.source = w.source AND dd.id = w.id"
        )
        parts.append(
            f""",
d{l} AS MATERIALIZED (
  SELECT v.source, v.id,
         CAST(SUM(v.sigma * ({scale} + {dterm}) // w.sigma) AS BIGINT) AS delta
  FROM s{depth} v JOIN sym e ON e.src = v.id
  JOIN s{depth} w ON w.source = v.source AND w.id = e.dst
                 AND w.dist = {l + 1}{djoin}
  WHERE v.dist = {l} GROUP BY v.source, v.id
)"""
        )
        prev_d = f"d{l}"
    unions = " UNION ALL ".join(
        f"SELECT * FROM d{l}" for l in range(depth - 1, 0, -1)
    )
    parts.append(
        f""",
bc AS (
  SELECT id, CAST(SUM(delta) AS BIGINT) AS bc_q
  FROM ({unions}) GROUP BY id
)
SELECT v.id, COALESCE(b.bc_q, 0) AS bc_q
FROM verts v LEFT JOIN bc b USING (id) ORDER BY v.id"""
    )
    return "".join(parts)


HB_ROUNDS = 3
HB_SEED = 7
HB_RMAX = 40
# the raw-HLL numerator alpha_32 * R^2 * 2^rmax, computed ONCE here and
# embedded verbatim in both engines so the doubles are identical
HB_NUMER = 0.697 * 32 * 32 * (1 << HB_RMAX)


def q_graph_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall t=3: per-vertex HLL sketch of the 3-hop ball,
    register-wise max union per round; exact integer harmonic sum +
    raw estimate — registers derive from md5, so the oracle replays
    every register exactly."""
    from motive_spark.kernels import hyperball

    return hyperball(
        _und(spark, sf_dir), rounds=HB_ROUNDS, seed=HB_SEED, rmax=HB_RMAX
    ).orderBy("id")


def _hyperball_sql(
    rounds: int = HB_ROUNDS, seed: int = HB_SEED, rmax: int = HB_RMAX
) -> str:
    h1 = f"('0x' || substr(md5(id || '|{seed}'), 1, 8))::BIGINT"
    h2 = f"('0x' || substr(md5(id || '|{seed}'), 9, 8))::BIGINT"
    parts = [
        "WITH "
        + SQL_GRAPH
        + f""",
u0 AS MATERIALIZED (
  SELECT id, {h1} % 32 AS j,
         LEAST(CASE WHEN {h2} = 0 THEN {rmax}
                    ELSE 33 - LENGTH(bin({h2})) END, {rmax}) AS r
  FROM verts
)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
u{t} AS MATERIALIZED (
  SELECT id, j, MAX(r) AS r FROM (
    SELECT id, j, r FROM u{t - 1}
    UNION ALL
    SELECT e.src AS id, s.j, s.r FROM sym e JOIN u{t - 1} s ON s.id = e.dst
  ) GROUP BY id, j
)"""
        )
    parts.append(
        f""",
agg AS (
  SELECT id,
         CAST(SUM(CAST(1 AS BIGINT) << ({rmax} - r)) AS BIGINT)
         + (32 - COUNT(*)) * (CAST(1 AS BIGINT) << {rmax}) AS s_int
  FROM u{rounds} GROUP BY id
)
SELECT id, CAST(s_int AS BIGINT) AS s_int,
       ROUND({HB_NUMER!r} / s_int, 6) AS ball_est
FROM agg ORDER BY id"""
    )
    return "".join(parts)


KT_K = 12
KT_ROUNDS = 6


def q_graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-truss of the co-purchase graph (edges closing >= 10
    triangles among surviving edges), fixed 6 peel rounds (converges
    in 5 at sf0.01), each survivor with its final support — the
    edge-cohesion filter between k-core and clique mining."""
    from motive_spark.kernels import k_truss

    return k_truss(
        _und(spark, sf_dir), KT_K, max_rounds=KT_ROUNDS
    ).orderBy("src", "dst")


def _ktruss_sql(k: int = KT_K, rounds: int = KT_ROUNDS) -> str:
    """Unrolled support peel: replay the kernel's k-core pre-filter
    (deg >= k-1), then ``rounds`` rounds of canonical-triangle
    (a<b<c) support counting + edge filter, then the final support
    recount — exactly kernels.k_truss(..., max_rounds=rounds)."""

    def tri_supp(src_rel: str, t: str, s: str) -> str:
        return f""",
{t} AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM {src_rel} e1
  JOIN {src_rel} e2 ON e2.src = e1.dst
  JOIN {src_rel} e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
{s} AS (
  SELECT src, dst, COUNT(*) AS supp FROM (
    SELECT a AS src, b AS dst FROM {t}
    UNION ALL SELECT b AS src, c AS dst FROM {t}
    UNION ALL SELECT a AS src, c AS dst FROM {t}
  ) GROUP BY src, dst
)"""

    parts = [
        "WITH "
        + SQL_GRAPH
        + f""",
pcd AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT src AS id FROM und UNION ALL SELECT dst FROM und
  ) GROUP BY id
),
pc AS MATERIALIZED (SELECT id FROM pcd WHERE deg >= {k - 1}),
a0 AS MATERIALIZED (
  SELECT e.src, e.dst FROM und e
  JOIN pc x ON e.src = x.id JOIN pc y ON e.dst = y.id
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(tri_supp(f"a{i - 1}", f"t{i}", f"s{i}"))
        parts.append(
            f""",
a{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM a{i - 1} e
  JOIN s{i} s ON s.src = e.src AND s.dst = e.dst
  WHERE s.supp >= {k - 2}
)"""
        )
    parts.append(tri_supp(f"a{rounds}", "tf", "sf"))
    parts.append(
        f"""
SELECT e.src, e.dst, COALESCE(s.supp, 0) AS supp
FROM a{rounds} e LEFT JOIN sf s ON s.src = e.src AND s.dst = e.dst
ORDER BY e.src, e.dst"""
    )
    return "".join(parts)


MSF_ROUNDS = 11  # >= log2(|V|) at sf0.01 — comp count halves per round
MSF_JUMPS = 11  # >= log2 of the longest possible parent chain


def q_graph_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the co-purchase graph weighted by
    shared-order multiplicity, under the total edge order (w, src,
    dst) — unique, so Boruvka (Spark) and the unrolled oracle agree
    edge-for-edge."""
    from motive_spark.kernels import boruvka_msf

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    a, b = li.alias("a"), li.alias("b")
    ew = (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return boruvka_msf(ew).orderBy("src", "dst")


def _msf_body(rounds: int, jumps: int, min_mult: int = 1) -> str:
    """WITH-body (no leading WITH, no final SELECT) of the unrolled
    Boruvka replay: per round, label endpoints, per-component
    ROW_NUMBER argmin over (w, src, dst), 2-cycle break to the min-id
    root, ``jumps`` pointer-jump steps, relabel.  Converged rounds are
    empty no-ops, so a fixed unroll >= log2(|V|) replays the kernel's
    run-to-convergence exactly.  Ends with ``forest`` (the chosen
    edges) and leaves ``l{rounds}`` (final component labels) in scope
    — shared by the MSF and bridges oracles."""
    parts = [
        f"""li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
ew AS MATERIALIZED (
  SELECT CAST(a.l_partkey AS BIGINT) AS src,
         CAST(b.l_partkey AS BIGINT) AS dst, COUNT(*) AS w
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_mult}
),
l0 AS MATERIALIZED (
  SELECT id, id AS c FROM (
    SELECT DISTINCT src AS id FROM ew UNION SELECT dst FROM ew
  )
)"""
    ]
    for r in range(1, rounds + 1):
        p = f"l{r - 1}"
        parts.append(
            f""",
x{r} AS MATERIALIZED (
  SELECT e.src, e.dst, e.w, ls.c AS cu, ld.c AS cv
  FROM ew e
  JOIN {p} ls ON ls.id = e.src JOIN {p} ld ON ld.id = e.dst
  WHERE ls.c <> ld.c
),
ch{r} AS MATERIALIZED (
  SELECT c, w, src, dst, oc FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY c ORDER BY w, src, dst
    ) AS rn
    FROM (
      SELECT cu AS c, w, src, dst, cv AS oc FROM x{r}
      UNION ALL
      SELECT cv AS c, w, src, dst, cu AS oc FROM x{r}
    )
  ) WHERE rn = 1
),
j{r}_0 AS MATERIALIZED (
  SELECT a.c,
         CASE WHEN b.oc = a.c AND a.c < a.oc THEN a.c ELSE a.oc END AS p
  FROM ch{r} a LEFT JOIN ch{r} b ON b.c = a.oc
)"""
        )
        for k in range(1, jumps + 1):
            parts.append(
                f""",
j{r}_{k} AS MATERIALIZED (
  SELECT a.c, COALESCE(b.p, a.p) AS p
  FROM j{r}_{k - 1} a LEFT JOIN j{r}_{k - 1} b ON b.c = a.p
)"""
            )
        parts.append(
            f""",
l{r} AS MATERIALIZED (
  SELECT l.id, COALESCE(j.p, l.c) AS c
  FROM {p} l LEFT JOIN j{r}_{jumps} j ON j.c = l.c
)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT src, dst, w FROM ch{r}" for r in range(1, rounds + 1)
    )
    parts.append(
        f""",
forest AS MATERIALIZED (
  SELECT DISTINCT src, dst, w FROM (
  {union}
  )
)"""
    )
    return "".join(parts)


def _msf_sql(rounds: int = MSF_ROUNDS, jumps: int = MSF_JUMPS) -> str:
    return (
        "WITH "
        + _msf_body(rounds, jumps)
        + "\nSELECT src, dst, w FROM forest ORDER BY src, dst"
    )


BRIDGE_MIN_MULT = 2


def _bridges_sql(rounds: int = MSF_ROUNDS, jumps: int = MSF_JUMPS) -> str:
    """Bridges via the same spanning forest the kernel builds: root
    every tree at its Boruvka component label (a real vertex id),
    climb parents recursively (safe — trees are acyclic), close the
    ancestor relation, then label each tree edge with the bit_xor of
    the md5 tags of non-tree edges covering it (deposited at both
    endpoints, XOR-summed over the subtree).  label 0 ⟺ bridge."""
    return (
        "WITH RECURSIVE "
        + _msf_body(rounds, jumps, min_mult=BRIDGE_MIN_MULT)
        + f""",
tadj AS MATERIALIZED (
  SELECT src, dst FROM forest
  UNION ALL SELECT dst AS src, src AS dst FROM forest
),
troots AS (SELECT DISTINCT c AS id FROM l{rounds}),
rooted AS (
  SELECT id, CAST(-1 AS BIGINT) AS parent FROM troots
  UNION ALL
  SELECT t.dst AS id, r.id AS parent
  FROM rooted r JOIN tadj t ON t.src = r.id AND t.dst <> r.parent
),
anc AS (
  SELECT id AS v, id AS a FROM rooted
  UNION ALL
  SELECT anc.v, r.parent AS a
  FROM anc JOIN rooted r ON r.id = anc.a
  WHERE r.parent <> -1
),
ntag AS MATERIALIZED (
  SELECT e.src, e.dst,
         ('0x' || substr(md5(CAST(e.src AS VARCHAR) || '|'
                             || CAST(e.dst AS VARCHAR)), 1, 15))::BIGINT
           AS h
  FROM ew e LEFT JOIN forest f ON f.src = e.src AND f.dst = e.dst
  WHERE f.src IS NULL
),
wv AS MATERIALIZED (
  SELECT id, bit_xor(h) AS acc FROM (
    SELECT src AS id, h FROM ntag UNION ALL SELECT dst AS id, h FROM ntag
  ) GROUP BY 1
),
lab AS (
  SELECT r.parent, r.id AS child, bit_xor(w.acc) AS label
  FROM rooted r
  JOIN anc a ON a.a = r.id
  JOIN wv w ON w.id = a.v
  WHERE r.parent <> -1
  GROUP BY 1, 2
)
SELECT LEAST(r.parent, r.id) AS src, GREATEST(r.parent, r.id) AS dst
FROM rooted r
LEFT JOIN lab l ON l.parent = r.parent AND l.child = r.id
WHERE r.parent <> -1 AND COALESCE(l.label, 0) = 0
ORDER BY src, dst"""
    )


def q_graph_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut edges of the multiplicity>=2 co-purchase backbone (the
    dense full graph is 2-edge-connected almost everywhere — the
    backbone has real pendants/cut edges): Boruvka spanning forest +
    md5 XOR covering tags, leaf-peeling subtree fold — the oracle
    rebuilds the identical forest and labels via recursive rooting."""
    from motive_spark.kernels import bridges

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    a, b = li.alias("a"), li.alias("b")
    ew = (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= BRIDGE_MIN_MULT)
    )
    return bridges(ew, weight_col="w").orderBy("src", "dst")


def q_graph_articulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut vertices of the multiplicity>=2 co-purchase backbone via
    Tarjan–Vishkin: arbitrary rooted spanning tree + preorder/subtree
    intervals + aux-graph connected components — no DFS anywhere.  The
    oracle rebuilds the identical tree, numbers it by recursive
    root-path rank, and replays the aux construction."""
    from motive_spark.kernels import articulation_points

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates()
    )
    a, b = li.alias("a"), li.alias("b")
    ew = (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= BRIDGE_MIN_MULT)
    )
    return articulation_points(ew, weight_col="w").orderBy("id")


def _articulation_sql(
    rounds: int = MSF_ROUNDS, jumps: int = MSF_JUMPS
) -> str:
    """Tarjan–Vishkin replay: Boruvka forest (shared _msf_body),
    recursive rooting carrying the root path, preorder = per-root rank
    of the path list, sizes from the ancestor closure, low/high =
    subtree min/max of non-tree reach, aux edges R1/R2, recursive
    hash-min components of the aux graph, verdict."""
    return (
        "WITH RECURSIVE "
        + _msf_body(rounds, jumps, min_mult=BRIDGE_MIN_MULT)
        + f""",
tadj AS MATERIALIZED (
  SELECT src, dst FROM forest
  UNION ALL SELECT dst AS src, src AS dst FROM forest
),
troots AS (SELECT DISTINCT c AS id FROM l{rounds}),
rooted AS (
  SELECT id, CAST(-1 AS BIGINT) AS parent, id AS root, [id] AS path
  FROM troots
  UNION ALL
  SELECT t.dst AS id, r.id AS parent, r.root, list_append(r.path, t.dst)
  FROM rooted r JOIN tadj t ON t.src = r.id AND t.dst <> r.parent
),
pre AS MATERIALIZED (
  SELECT id, parent, root,
         ROW_NUMBER() OVER (PARTITION BY root ORDER BY path) - 1 AS pre
  FROM rooted
),
anc AS (
  SELECT id AS v, id AS a FROM rooted
  UNION ALL
  SELECT anc.v, r.parent AS a FROM anc JOIN rooted r ON r.id = anc.a
  WHERE r.parent <> -1
),
sz AS MATERIALIZED (SELECT a AS id, COUNT(*) AS size FROM anc GROUP BY 1),
nte AS MATERIALIZED (
  SELECT e.src, e.dst
  FROM ew e LEFT JOIN forest f ON f.src = e.src AND f.dst = e.dst
  WHERE f.src IS NULL
),
reach AS MATERIALIZED (
  SELECT n.id, MIN(p.pre) AS rlo, MAX(p.pre) AS rhi FROM (
    SELECT src AS id, dst AS nb FROM nte
    UNION ALL SELECT dst AS id, src AS nb FROM nte
  ) n JOIN pre p ON p.id = n.nb GROUP BY 1
),
base AS MATERIALIZED (
  SELECT p.id, p.parent, p.pre,
         LEAST(p.pre, COALESCE(r.rlo, p.pre)) AS v_lo,
         GREATEST(p.pre, COALESCE(r.rhi, p.pre)) AS v_hi
  FROM pre p LEFT JOIN reach r USING (id)
),
lowhigh AS MATERIALIZED (
  SELECT a.a AS id, MIN(b.v_lo) AS low, MAX(b.v_hi) AS high
  FROM anc a JOIN base b ON b.id = a.v GROUP BY 1
),
info AS MATERIALIZED (
  SELECT p.id, p.parent, p.pre, s.size FROM pre p JOIN sz s USING (id)
),
r1 AS (
  SELECT n.src, n.dst
  FROM nte n
  JOIN info ia ON ia.id = n.src
  JOIN info ib ON ib.id = n.dst
  WHERE NOT (ia.pre <= ib.pre AND ib.pre < ia.pre + ia.size)
    AND NOT (ib.pre <= ia.pre AND ia.pre < ib.pre + ib.size)
),
r2 AS (
  SELECT i.id AS src, i.parent AS dst
  FROM info i
  JOIN lowhigh lh ON lh.id = i.id
  JOIN info ip ON ip.id = i.parent
  WHERE i.parent <> -1 AND ip.parent <> -1
    AND (lh.low < ip.pre OR lh.high >= ip.pre + ip.size)
),
auxsym AS MATERIALIZED (
  SELECT src, dst FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
  UNION ALL
  SELECT dst AS src, src AS dst
  FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
),
auxreach(id, m) AS (
  SELECT src AS id, src AS m FROM auxsym
  UNION
  SELECT s.dst AS id, r.m FROM auxsym s JOIN auxreach r ON s.src = r.id
),
blocks AS MATERIALIZED (
  SELECT i.id AS child_edge,
         COALESCE(MIN(ar.m), i.id) AS block
  FROM info i LEFT JOIN auxreach ar ON ar.id = i.id
  WHERE i.parent <> -1
  GROUP BY i.id
),
nonroot AS (
  SELECT DISTINCT c.parent AS id
  FROM info c
  JOIN blocks bc ON bc.child_edge = c.id
  JOIN blocks bp ON bp.child_edge = c.parent
  WHERE c.parent <> -1 AND bc.block <> bp.block
),
rootart AS (
  SELECT c.parent AS id
  FROM info c JOIN blocks bc ON bc.child_edge = c.id
  JOIN info p ON p.id = c.parent
  WHERE c.parent <> -1 AND p.parent = -1
  GROUP BY c.parent HAVING COUNT(DISTINCT bc.block) >= 2
)
SELECT id FROM (
  SELECT id FROM nonroot
  JOIN info USING (id) WHERE parent <> -1
  UNION SELECT id FROM rootart
) ORDER BY id"""
    )


def q_graph_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Biased (p, q) node2vec walks with integer weights (1, 2, 4) =
    (return, distance-1, distance-2) — p=2, q=0.5 — 4 steps, 2 walks
    per vertex; the DuckDB oracle replays the weighted cumulative-sum
    pick over the sorted adjacency byte-for-byte."""
    from motive_spark.graph import node2vec_walks

    return node2vec_walks(
        _und(spark, sf_dir),
        walk_length=4,
        walks_per_vertex=2,
        seed=7,
        w_return=1,
        w_near=2,
        w_far=4,
    ).orderBy("start", "widx")


def _node2vec_sql() -> str:
    """Unrolled biased-walk oracle: step 1 uniform index pick, steps
    2..3 explode sorted neighbors, classify vs prev (LEFT JOIN sym),
    integer cumulative-sum pick at md5 mod total."""
    parts = [
        "WITH " + SQL_GRAPH + """,
adj AS MATERIALIZED (
  SELECT src, list(dst ORDER BY dst) AS nbrs, COUNT(*) AS deg
  FROM sym GROUP BY src
),
s1 AS MATERIALIZED (
  SELECT a.src AS start, w.widx, a.src AS prev,
         a.nbrs[CAST(('0x' || substr(md5(a.src || '|' || w.widx || '|1|7'), 1, 8))::BIGINT % a.deg AS INT) + 1] AS cur,
         a.src || '|' || a.nbrs[CAST(('0x' || substr(md5(a.src || '|' || w.widx || '|1|7'), 1, 8))::BIGINT % a.deg AS INT) + 1] AS path
  FROM adj a CROSS JOIN (VALUES (0), (1)) AS w(widx)
)"""
    ]
    for t in (2, 3):
        parts.append(
            f""",x{t} AS MATERIALIZED (
  SELECT s.start, s.widx, s.prev, s.cur, s.path,
         UNNEST(a.nbrs) AS x, generate_subscripts(a.nbrs, 1) AS pos
  FROM s{t - 1} s JOIN adj a ON a.src = s.cur
),
w{t} AS MATERIALIZED (
  SELECT e.start, e.widx, e.cur, e.path, e.x, e.pos,
         CASE WHEN e.x = e.prev THEN 1
              WHEN d.src IS NOT NULL THEN 2
              ELSE 4 END AS wt
  FROM x{t} e LEFT JOIN sym d ON d.src = e.prev AND d.dst = e.x
),
c{t} AS MATERIALIZED (
  SELECT start, widx, cur, path, x, wt,
         SUM(wt) OVER (PARTITION BY start, widx ORDER BY pos) AS cum,
         SUM(wt) OVER (PARTITION BY start, widx) AS tot
  FROM w{t}
),
s{t} AS MATERIALIZED (
  SELECT start, widx, cur AS prev, x AS cur, path || '|' || x AS path
  FROM c{t}
  WHERE cum - wt <= ('0x' || substr(md5(start || '|' || widx || '|{t}|7'), 1, 8))::BIGINT % tot
    AND ('0x' || substr(md5(start || '|' || widx || '|{t}|7'), 1, 8))::BIGINT % tot < cum
)"""
        )
    parts.append(
        "\nSELECT start, widx, path FROM s3 ORDER BY start, widx"
    )
    return "".join(parts)


def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-200 link-prediction candidates by Jaccard (rounded BEFORE
    ranking; ties by (u, v)) with common-neighbor and Adamic-Adar
    scores, under the kernel's DEFAULT auto hub cap (99.9th-percentile
    middle-degree exclusion) — the oracle reproduces the cap from the
    degree histogram with exact integer arithmetic.

    Runs through the fused top-k path (cached derivation, packed-key
    wedge aggregation, broadcast degree/edge-flag lookups, TakeOrdered,
    caches unpersisted on return) — identical results to the full
    score-table composition, restructured plan (r5: the naive
    composition re-derived the co-purchase graph ~6x and paid a
    two-column aggregation key; see link_prediction_topk's docstring
    for the same-session A/B numbers)."""
    from motive_spark.graph import link_prediction_topk

    return link_prediction_topk(_und(spark, sf_dir), k=200).orderBy("rank")


def q_label_propagation_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised LP: the 4 smallest vertices are clamped to label
    id % 2; 4 synchronous rounds; unreached vertices stay NULL."""
    from motive_spark.graph import vertices
    from motive_spark.kernels import seeded_label_propagation

    und = _und(spark, sf_dir).cache()
    seeds = (
        vertices(und)
        .orderBy("id")
        .limit(4)
        .select("id", F.pmod("id", F.lit(2)).alias("label"))
    )
    out = seeded_label_propagation(und, seeds, iters=LP_ITERS)
    return out.orderBy("id")


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.kernels import connected_components

    return connected_components(_und(spark, sf_dir)).orderBy("id")


def q_components_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSR-plan connected components against the same oracle."""
    from motive_spark.kernels import connected_components

    return connected_components(_und(spark, sf_dir), strategy="csr").orderBy("id")


def q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.kernels import label_propagation

    return label_propagation(_und(spark, sf_dir), iters=LP_ITERS).orderBy("id")


def q_labelprop_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSR-plan label propagation against the same oracle."""
    from motive_spark.kernels import label_propagation

    return label_propagation(
        _und(spark, sf_dir), iters=LP_ITERS, strategy="csr"
    ).orderBy("id")


LOUVAIN_ROUNDS = 3


def q_graph_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous Louvain local-move refinement (3 rounds, integer
    2m²-scaled gains, smallest-community tie-break) on the co-purchase
    graph — deterministic, so the oracle unrolls the identical rounds."""
    from motive_spark.kernels import louvain_refine

    return louvain_refine(_und(spark, sf_dir), rounds=LOUVAIN_ROUNDS).orderBy(
        "id"
    )


def _louvain_sql(rounds: int = LOUVAIN_ROUNDS) -> str:
    parts = [
        "WITH " + SQL_GRAPH + ",",
        "k AS MATERIALIZED (SELECT src AS id, COUNT(*) AS k FROM sym "
        "GROUP BY 1),",
        "m2 AS (SELECT COUNT(*) AS m2 FROM sym),",
        "c0 AS MATERIALIZED (SELECT id, id AS comm FROM verts)",
    ]
    for t in range(1, rounds + 1):
        p = f"c{t - 1}"
        parts.append(
            f""",kt{t} AS MATERIALIZED (
  SELECT c.comm, CAST(SUM(k.k) AS BIGINT) AS ktot
  FROM {p} c JOIN k USING (id) GROUP BY 1
),
cand{t} AS (
  SELECT id, cand, CAST(SUM(kic) AS BIGINT) AS kic FROM (
    SELECT e.src AS id, c.comm AS cand, COUNT(*) AS kic
    FROM sym e JOIN {p} c ON e.dst = c.id GROUP BY 1, 2
    UNION ALL SELECT id, comm AS cand, 0 AS kic FROM {p}
  ) GROUP BY 1, 2
),
sc{t} AS (
  SELECT a.id, a.cand,
         m2.m2 * a.kic
           - k.k * (kt.ktot
                    - CASE WHEN own.comm = a.cand THEN k.k ELSE 0 END)
           AS gain
  FROM cand{t} a
  JOIN k ON k.id = a.id
  JOIN {p} own ON own.id = a.id
  JOIN kt{t} kt ON kt.comm = a.cand
  CROSS JOIN m2
),
c{t} AS MATERIALIZED (
  SELECT id, cand AS comm FROM (
    SELECT id, cand, ROW_NUMBER() OVER (
      PARTITION BY id ORDER BY gain DESC, cand ASC) AS rn
    FROM sc{t}
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"\nSELECT id, comm AS community FROM c{rounds} ORDER BY id"
    )
    return "".join(parts)


LOUVAIN2_ROUNDS = 3


def q_graph_louvain2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilevel Louvain: 3 synchronous rounds on the raw graph,
    contraction (intra mass as self-loops), 3 weighted rounds on the
    coarse graph, supernode labels mapped back to every vertex — the
    full Blondel multilevel shape, deterministic at each step."""
    from motive_spark.kernels import louvain_multilevel

    return louvain_multilevel(
        _und(spark, sf_dir),
        rounds1=LOUVAIN_ROUNDS,
        rounds2=LOUVAIN2_ROUNDS,
    ).orderBy("id")


def _louvain2_sql(
    r1: int = LOUVAIN_ROUNDS, r2: int = LOUVAIN2_ROUNDS
) -> str:
    body = _louvain_sql(r1)
    body = body[: body.rindex("\nSELECT id, comm AS community")]
    parts = [
        body,
        f""",
cw AS MATERIALIZED (
  SELECT LEAST(a.comm, b.comm) AS src, GREATEST(a.comm, b.comm) AS dst,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM und e
  JOIN c{r1} a ON a.id = e.src
  JOIN c{r1} b ON b.id = e.dst
  GROUP BY 1, 2
),
csym AS MATERIALIZED (
  SELECT src, dst, w FROM cw WHERE src <> dst
  UNION ALL
  SELECT dst AS src, src AS dst, w FROM cw WHERE src <> dst
),
kw AS MATERIALIZED (
  SELECT id, CAST(SUM(w) AS BIGINT) AS k FROM (
    SELECT src AS id, w FROM csym
    UNION ALL SELECT src AS id, 2 * w AS w FROM cw WHERE src = dst
  ) GROUP BY 1
),
m2w AS (SELECT CAST(SUM(k) AS BIGINT) AS m2 FROM kw),
wc0 AS MATERIALIZED (SELECT id, id AS comm FROM kw)""",
    ]
    for t in range(1, r2 + 1):
        p = f"wc{t - 1}"
        parts.append(
            f""",
wkt{t} AS MATERIALIZED (
  SELECT c.comm, CAST(SUM(kw.k) AS BIGINT) AS ktot
  FROM {p} c JOIN kw ON kw.id = c.id GROUP BY 1
),
wcand{t} AS (
  SELECT id, cand, CAST(SUM(kic) AS BIGINT) AS kic FROM (
    SELECT e.src AS id, c.comm AS cand, e.w AS kic
    FROM csym e JOIN {p} c ON c.id = e.dst
    UNION ALL SELECT id, comm AS cand, 0 AS kic FROM {p}
  ) GROUP BY 1, 2
),
wsc{t} AS (
  SELECT a.id, a.cand,
         m2w.m2 * a.kic
           - kw.k * (kt.ktot
                     - CASE WHEN own.comm = a.cand THEN kw.k ELSE 0 END)
           AS gain
  FROM wcand{t} a
  JOIN kw ON kw.id = a.id
  JOIN {p} own ON own.id = a.id
  JOIN wkt{t} kt ON kt.comm = a.cand
  CROSS JOIN m2w
),
wc{t} AS MATERIALIZED (
  SELECT id, cand AS comm FROM (
    SELECT id, cand, ROW_NUMBER() OVER (
      PARTITION BY id ORDER BY gain DESC, cand ASC) AS rn
    FROM wsc{t}
  ) WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT v.id, w.comm AS community
FROM c{r1} v JOIN wc{r2} w ON w.id = v.comm
ORDER BY v.id"""
    )
    return "".join(parts)


def q_graph_contracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph coarsening: the co-purchase graph contracted by its
    3-round Louvain assignment — community-level edge list with
    integer weights, intra-community mass kept as self-loops (what a
    weighted second Louvain level consumes)."""
    from motive_spark.kernels import contract_graph, louvain_refine

    # within-query cache: louvain_refine and contract_graph both read und
    und = _und(spark, sf_dir).cache()
    comm = louvain_refine(und, rounds=LOUVAIN_ROUNDS)
    return contract_graph(und, comm).orderBy("src", "dst")


def _contracted_sql(rounds: int = LOUVAIN_ROUNDS) -> str:
    # strip _louvain_sql's final SELECT, append the contraction agg
    body = _louvain_sql(rounds)
    body = body[: body.rindex("\nSELECT id, comm AS community")]
    return (
        body
        + f"""
SELECT LEAST(a.comm, b.comm) AS src, GREATEST(a.comm, b.comm) AS dst,
       COUNT(*) AS w
FROM und e
JOIN c{rounds} a ON a.id = e.src
JOIN c{rounds} b ON b.id = e.dst
GROUP BY 1, 2 ORDER BY src, dst"""
    )


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
        "pagerank_csr": q_pagerank_csr,
        "personalized_pagerank": q_personalized_pagerank,
        "pagerank_weighted": q_pagerank_weighted,
        "hits": q_hits,
        "graph_kcore": q_graph_kcore,
        "graph_scc": q_graph_scc,
        "graph_clustering_coeff": q_graph_clustering,
        "graph_assortativity": q_graph_assortativity,
        "graph_khop": q_graph_khop,
        "graph_sssp": q_graph_sssp,
        "graph_sssp_delta": q_graph_sssp_delta,
        "graph_neighbor_features": q_graph_neighbor_features,
        "graph_negative_samples": q_graph_negative_samples,
        "graph_harmonic": q_graph_harmonic,
        "graph_random_walks": q_graph_random_walks,
        "graph_node2vec_walks": q_graph_node2vec_walks,
        "graph_modularity": q_graph_modularity,
        "graph_louvain": q_graph_louvain,
        "graph_contracted": q_graph_contracted,
        "graph_louvain2": q_graph_louvain2,
        "graph_coloring": q_graph_coloring,
        "graph_betweenness": q_graph_betweenness,
        "graph_hyperball": q_graph_hyperball,
        "graph_ktruss": q_graph_ktruss,
        "graph_msf": q_graph_msf,
        "graph_bridges": q_graph_bridges,
        "graph_articulation": q_graph_articulation,
        "graph_link_prediction": q_graph_link_prediction,
        "connected_components": q_components,
        "connected_components_csr": q_components_csr,
        "label_propagation": q_labelprop,
        "label_propagation_csr": q_labelprop_csr,
        "label_propagation_seeded": q_label_propagation_seeded,
        "triangle_count_total": q_triangle_total,
        "triangles_per_vertex": q_triangles_per_vertex,
        **_DATAPIPE_QUERIES,
        **_RELATIONAL_QUERIES,
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
        "pagerank_csr": _pagerank_sql(),
        "personalized_pagerank": _ppr_sql(PPR_SEEDS),
        "pagerank_weighted": _weighted_pr_sql(),
        "hits": _hits_sql(),
        "graph_kcore": _kcore_sql(80, 8),
        "graph_link_prediction": (
            "WITH " + SQL_GRAPH + """,
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
hist AS (SELECT deg AS d, COUNT(*) AS c FROM deg GROUP BY 1),
nv AS (SELECT COUNT(*) AS n FROM deg),
-- the kernel's default auto hub cap: smallest degree d such that at
-- most 0.1% of vertices have degree > d (exact integer arithmetic)
capq AS (
  SELECT MIN(d) AS cap FROM hist h, nv
  WHERE (SELECT COALESCE(SUM(c), 0) FROM hist h2 WHERE h2.d > h.d) * 1000
        <= nv.n
),
mid AS (SELECT e.src AS w, e.dst AS u, d.deg AS wdeg
        FROM sym e JOIN deg d ON e.src = d.id, capq
        WHERE d.deg <= capq.cap),
pairs AS (
  SELECT a.u, b.u AS v, COUNT(*) AS common_neighbors,
         SUM(1.0 / ln(a.wdeg)) AS aa
  FROM mid a JOIN mid b ON a.w = b.w AND a.u < b.u
  GROUP BY a.u, b.u
),
scored AS (
  SELECT p.u, p.v, p.common_neighbors,
         ROUND(p.common_neighbors * 1.0
               / (x.deg + y.deg - p.common_neighbors), 6) AS jaccard,
         ROUND(p.aa, 6) AS adamic_adar,
         (e.src IS NOT NULL) AS is_edge
  FROM pairs p
  JOIN deg x ON x.id = p.u JOIN deg y ON y.id = p.v
  LEFT JOIN und e ON e.src = p.u AND e.dst = p.v
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard DESC, u ASC, v ASC) AS rank
  FROM scored
)
SELECT u, v, common_neighbors, jaccard, adamic_adar, is_edge, rank
FROM ranked WHERE rank <= 200 ORDER BY rank"""
        ),
        "graph_random_walks": (
            "WITH " + SQL_GRAPH + """,
adj AS MATERIALIZED (
  SELECT src, list(dst ORDER BY dst) AS nbrs, COUNT(*) AS deg
  FROM sym GROUP BY src
),
s0 AS (
  SELECT src AS start, w.widx, src AS cur, CAST(src AS VARCHAR) AS path
  FROM adj CROSS JOIN (VALUES (0), (1)) AS w(widx)
)"""
            + "".join(
                f""",s{t} AS MATERIALIZED (
  SELECT s.start, s.widx,
         a.nbrs[CAST(('0x' || substr(md5(s.start || '|' || s.widx || '|' || '{t}' || '|' || '7'), 1, 8))::BIGINT % a.deg AS INT) + 1] AS cur,
         s.path || '|' || a.nbrs[CAST(('0x' || substr(md5(s.start || '|' || s.widx || '|' || '{t}' || '|' || '7'), 1, 8))::BIGINT % a.deg AS INT) + 1] AS path
  FROM s{t - 1} s JOIN adj a ON a.src = s.cur
)"""
                for t in range(1, 4)
            )
            + "\nSELECT start, widx, path FROM s3 ORDER BY start, widx"
        ),
        "graph_node2vec_walks": _node2vec_sql(),
        "graph_modularity": _modularity_sql(),
        "graph_louvain": _louvain_sql(),
        "graph_contracted": _contracted_sql(),
        "graph_louvain2": _louvain2_sql(),
        "graph_coloring": _coloring_sql(),
        "graph_betweenness": _betweenness_sql(),
        "graph_hyperball": _hyperball_sql(),
        "graph_ktruss": _ktruss_sql(),
        "graph_msf": _msf_sql(),
        "graph_bridges": _bridges_sql(),
        "graph_articulation": _articulation_sql(),
        "graph_sssp": _sssp_sql(),
        "graph_sssp_delta": _sssp_sql(rounds=8),
        "graph_neighbor_features": _NEIGHBOR_FEATURES_SQL,
        "graph_negative_samples": _NEGATIVE_SAMPLES_SQL,
        "graph_harmonic": _harmonic_sql(),
        "graph_khop": (
            "WITH " + SQL_GRAPH + """,
seeds AS (SELECT id FROM verts ORDER BY id LIMIT 3),
l0 AS (SELECT id AS source, id, 0 AS dist FROM seeds),
l1 AS (SELECT DISTINCT h.source, e.dst AS id, 1 AS dist
       FROM l0 h JOIN sym e ON h.id = e.src),
l2 AS (SELECT DISTINCT h.source, e.dst AS id, 2 AS dist
       FROM l1 h JOIN sym e ON h.id = e.src)
SELECT source, id, MIN(dist) AS dist
FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1 UNION ALL SELECT * FROM l2)
GROUP BY source, id ORDER BY source, id"""
        ),
        "graph_clustering_coeff": SQL_TRI + """,
inc AS (
  SELECT x AS id FROM tri
  UNION ALL SELECT y AS id FROM tri
  UNION ALL SELECT z AS id FROM tri
),
cnt AS (SELECT id, COUNT(*) AS t FROM inc GROUP BY id),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src)
SELECT v.id,
       CASE WHEN d.deg >= 2
            THEN ROUND(2.0 * COALESCE(c.t, 0) / (d.deg * (d.deg - 1)), 6)
            ELSE 0.0 END AS lcc
FROM verts v JOIN deg d USING (id) LEFT JOIN cnt c USING (id)
ORDER BY v.id""",
        "graph_assortativity": (
            "WITH " + SQL_GRAPH + """,
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src)
SELECT ROUND(corr(x.deg, y.deg), 6) AS assortativity
FROM sym e JOIN deg x ON e.src = x.id JOIN deg y ON e.dst = y.id"""
        ),
        "graph_scc": """
WITH RECURSIVE dedges AS MATERIALIZED (
  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS src,
                  CAST(b.l_partkey AS BIGINT) AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey != b.l_partkey
),
dverts AS MATERIALIZED (
  SELECT DISTINCT v AS id FROM (
    SELECT src AS v FROM dedges UNION ALL SELECT dst FROM dedges)
),
reach(a, b) AS (
  SELECT src, dst FROM dedges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN dedges e ON r.b = e.src
),
mutual AS (
  SELECT r1.a AS v, r1.b AS u
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
)
SELECT d.id, LEAST(d.id, COALESCE(MIN(m.u), d.id)) AS scc
FROM dverts d LEFT JOIN mutual m ON m.v = d.id
GROUP BY d.id ORDER BY d.id""",

        "connected_components": SQL_COMPONENTS,
        "connected_components_csr": SQL_COMPONENTS,
        "label_propagation": _labelprop_sql(),
        "label_propagation_csr": _labelprop_sql(),
        "label_propagation_seeded": _seeded_lp_sql(),
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
        **_DATAPIPE_ORACLES,
        **_RELATIONAL_ORACLES,
    }


# ---------------------------------------------------------------------------
# datapipe queries (dedup / text / similarity) + oracles
# ---------------------------------------------------------------------------

# generate_subscripts expands in lockstep with unnest (Postgres-style
# SRF), giving DETERMINISTIC in-list positions — a ROW_NUMBER over the
# unnest is not order-stable under DuckDB's parallel execution.
_GRAM_SQL = """
toks AS MATERIALIZED (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS p
  FROM documents
)
"""


def _grams_sql(n: int) -> str:
    """Distinct word n-grams per doc — mirrors dedup.word_ngrams exactly.

    DuckDB's UNNEST preserves list order and ROW_NUMBER over the
    per-doc unnest enumerates positions (same as posexplode)."""
    joins = []
    concat = "t0.w"
    for j in range(1, n):
        joins.append(
            f"JOIN toks t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.p = t0.p + {j}"
        )
        concat += f" || ' ' || t{j}.w"
    return f"""
grams AS MATERIALIZED (
  SELECT DISTINCT t0.doc_id, {concat} AS gram
  FROM toks t0
  {' '.join(joins)}
)
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.datapipe import exact_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_duplicates(docs).orderBy("text_md5")


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.datapipe import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(docs, n=3, threshold=0.15, max_doc_freq=1000).orderBy(
        "doc_a", "doc_b"
    )


INCR_THRESHOLD = 0.15


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state dedup: the odd-id half of documents arrives as the
    NEW batch and is screened against the even-id corpus only (no
    corpus×corpus re-pairing); every new doc gets a keep/drop verdict
    with its best corpus match."""
    from motive_spark.datapipe import incremental_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.where(F.pmod("doc_id", F.lit(2)) == 0)
    new = docs.where(F.pmod("doc_id", F.lit(2)) == 1)
    return incremental_dedup(
        new, corpus, n=3, threshold=INCR_THRESHOLD, max_doc_freq=1000
    ).orderBy("doc_id")


def _incremental_dedup_sql(threshold: float = INCR_THRESHOLD) -> str:
    return (
        "WITH "
        + _GRAM_SQL
        + ","
        + _grams_sql(3)
        + f""",
gn AS MATERIALIZED (SELECT doc_id, gram FROM grams WHERE doc_id % 2 = 1),
gc AS MATERIALIZED (SELECT doc_id, gram FROM grams WHERE doc_id % 2 = 0),
sn AS (SELECT doc_id, COUNT(*) AS na FROM gn GROUP BY 1),
sc AS (SELECT doc_id, COUNT(*) AS nb FROM gc GROUP BY 1),
rare AS (SELECT gram FROM gc GROUP BY gram HAVING COUNT(*) <= 1000),
shared AS (
  SELECT n.doc_id AS new_id, c.doc_id AS corp_id, COUNT(*) AS shared
  FROM gn n
  JOIN (SELECT gc.* FROM gc JOIN rare USING (gram)) c USING (gram)
  GROUP BY 1, 2
),
scored AS (
  SELECT s.new_id, s.corp_id,
         ROUND(s.shared * 1.0 / (sn.na + sc.nb - s.shared), 6) AS j
  FROM shared s
  JOIN sn ON sn.doc_id = s.new_id
  JOIN sc ON sc.doc_id = s.corp_id
),
best AS (
  SELECT new_id, corp_id AS dup_of, j AS jaccard FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY new_id ORDER BY j DESC, corp_id ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT d.doc_id,
       COALESCE(b.jaccard >= {threshold}, FALSE) AS is_dup,
       CASE WHEN b.jaccard >= {threshold} THEN b.dup_of END AS dup_of,
       CASE WHEN b.jaccard >= {threshold} THEN b.jaccard END AS jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN best b ON b.new_id = d.doc_id
ORDER BY d.doc_id"""
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed dedup pipeline: Jaccard candidate pairs -> connected
    components -> per-cluster keeper; the oracle recomputes the pairs
    and closes them with a recursive reachability CTE."""
    from motive_spark.datapipe import dedup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup_clusters(
        docs, n=3, threshold=0.15, max_doc_freq=1000
    ).orderBy("doc_id")


def _dedup_clusters_sql(threshold: float = 0.15, max_df: int = 1000) -> str:
    return (
        "WITH RECURSIVE "
        + _GRAM_SQL
        + ","
        + _grams_sql(3)
        + f""",
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
rare AS MATERIALIZED (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= {max_df}
),
g AS MATERIALIZED (SELECT doc_id, grams.gram FROM grams JOIN rare ON grams.gram = rare.gram),
shared AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM shared
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE ROUND(shared * 1.0 / (sa.n_grams + sb.n_grams - shared), 6)
        >= {threshold}
),
psym AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, m) AS (
  SELECT src AS id, src AS m FROM psym
  UNION
  SELECT s.dst AS id, r.m FROM psym s JOIN reach r ON s.src = r.id
),
comp AS (SELECT id, MIN(m) AS cluster FROM reach GROUP BY id),
csz AS (SELECT cluster, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
SELECT comp.id AS doc_id, comp.cluster, csz.cluster_size,
       (comp.id = comp.cluster) AS is_keeper
FROM comp JOIN csz USING (cluster) ORDER BY doc_id"""
    )


def q_dedup_multi_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of lexical (Jaccard >= 0.15) and semantic (cosine >=
    0.95) duplicate signals closed transitively through the CC kernel
    — exact embedding pairs here so the oracle replays the identical
    pair set (the LSH path is the recall-tested scale variant)."""
    from motive_spark.datapipe import multi_signal_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return multi_signal_dedup(
        docs,
        emb,
        n=3,
        jaccard_threshold=0.15,
        cos_threshold=0.95,
        max_doc_freq=1000,
        method="exact",
    ).orderBy("doc_id")


def _multi_signal_sql(
    threshold: float = 0.15, cos: float = 0.95, max_df: int = 1000
) -> str:
    return (
        "WITH RECURSIVE "
        + _GRAM_SQL
        + ","
        + _grams_sql(3)
        + f""",
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
rare AS MATERIALIZED (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= {max_df}
),
g AS MATERIALIZED (SELECT doc_id, grams.gram FROM grams JOIN rare ON grams.gram = rare.gram),
shared AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
tpairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM shared
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE ROUND(shared * 1.0 / (sa.n_grams + sb.n_grams - shared), 6)
        >= {threshold}
),
emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
epairs AS MATERIALIZED (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM emb a CROSS JOIN emb b
  WHERE a.vec_id < b.vec_id
    AND ROUND(list_cosine_similarity(a.v, b.v), 6) >= {cos}
),
pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM tpairs UNION SELECT doc_a, doc_b FROM epairs
),
psym AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, m) AS (
  SELECT src AS id, src AS m FROM psym
  UNION
  SELECT s.dst AS id, r.m FROM psym s JOIN reach r ON s.src = r.id
),
comp AS (SELECT id, MIN(m) AS cluster FROM reach GROUP BY id),
csz AS (SELECT cluster, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
SELECT comp.id AS doc_id, comp.cluster, csz.cluster_size,
       (comp.id = comp.cluster) AS is_keeper
FROM comp JOIN csz USING (cluster) ORDER BY doc_id"""
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.datapipe import minhash_lsh_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_candidates(docs, n=3, num_hashes=12, bands=4).orderBy(
        "doc_a", "doc_b"
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.datapipe import simhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_signatures(docs, n=2).orderBy("doc_id")


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.datapipe import token_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_stats(docs).drop("n_subtokens").orderBy("doc_id")


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.datapipe import quality_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return quality_scores(docs).orderBy("doc_id")


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed char-trigram NB language ID (integer-quantized weights, so
    both engines compute the exact same argmax)."""
    from motive_spark.datapipe import detect_language_ngram

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return detect_language_ngram(docs).orderBy("doc_id")


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.datapipe.dedup import word_ngrams
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.size(F.split("text", " ")) >= 5
    )
    g = word_ngrams(docs, 5).select("doc_id", F.md5("gram").alias("h"))
    w = Window.partitionBy("doc_id").orderBy("h")
    return (
        g.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 4)
        .orderBy("doc_id", "rank")
    )


def q_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from motive_spark.datapipe import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return brute_force_topk(emb, k=5, n_queries=10).orderBy("query_id", "rank")


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs baseline —
    the LSH-bucketed variant is the scale path, recall-tested)."""
    from motive_spark.datapipe import embedding_near_duplicates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_duplicates(emb, threshold=0.4, method="exact").orderBy(
        "vec_a", "vec_b"
    )


def q_knn_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN with a REAL oracle: random-hyperplane LSH buckets +
    exact rescoring, the same seeded numpy plane matrix embedded in the
    DuckDB SQL as literals (identical bucketing and candidate sets)."""
    from motive_spark.datapipe.similarity import lsh_bucketed_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    assert dim == _LSH_DIM, f"oracle planes baked for dim {_LSH_DIM}, got {dim}"
    return lsh_bucketed_topk(
        emb, k=5, n_planes=8, n_tables=4, seed=42, n_queries=10
    ).orderBy("query_id", "rank")


_LSH_DIM = 64


def _lsh_planes_values(n_tables: int = 4, n_planes: int = 8) -> str:
    """The lsh_bucketed_topk plane matrix (numpy default_rng(42)
    standard_normal) as a DuckDB VALUES literal."""
    import numpy as np

    rng = np.random.default_rng(42)
    planes = rng.standard_normal(size=(n_tables, n_planes, _LSH_DIM))
    rows = ",\n".join(
        "(%d, %d, [%s]::DOUBLE[])"
        % (t, p, ",".join("%.17g" % x for x in planes[t, p]))
        for t in range(n_tables)
        for p in range(n_planes)
    )
    return rows


def _lsh_sql() -> str:
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes(t, p, plane) AS (VALUES {_lsh_planes_values()}),
signs AS (
  SELECT vec_id, t, p,
         CASE WHEN list_dot_product(v, plane) >= 0 THEN '1' ELSE '0' END AS bit
  FROM emb CROSS JOIN planes
),
buckets AS (
  SELECT vec_id, CAST(t AS VARCHAR) || '|' || string_agg(bit, '' ORDER BY p) AS bucket
  FROM signs GROUP BY vec_id, t
),
b2 AS (SELECT e.vec_id, e.v, b.bucket FROM emb e JOIN buckets b ON e.vec_id = b.vec_id),
cands AS (
  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
  FROM b2 q JOIN b2 n USING (bucket)
  WHERE q.vec_id < 10 AND q.vec_id != n.vec_id
),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(list_cosine_similarity(qe.v, ne.v), 6) AS cos
  FROM cands
  JOIN emb qe ON qe.vec_id = query_id
  JOIN emb ne ON ne.vec_id = neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 5
ORDER BY query_id, rank"""


def q_knn_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ANN top-k: deterministic md5-picked centroids, argmax-cosine
    cell assignment, 4-of-16 probed cells, exact rescoring — the full
    approximate plan is replicated in the DuckDB oracle."""
    from motive_spark.datapipe import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(emb, k=5, n_queries=10, n_centroids=16, n_probe=4).orderBy(
        "query_id", "rank"
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact contract for the mapInPandas byte-histogram
    featurizer: per-bin byte COUNTS recovered from the normalized
    float32 features via round(f * n_bytes) (exact — float32 error is
    ~1e-4 of a count at n_bytes <= 553, far under the 0.5 rounding
    radius), plus a (bin+1)-weighted checksum over all 32 bins so the
    whole histogram is pinned, not just the sampled bins."""
    from motive_spark.datapipe.multimodal import (
        attach_binary_payload,
        byte_histogram_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tab = attach_binary_payload(docs)
    feats = byte_histogram_features(tab).join(
        tab.select("doc_id", F.col("meta.n_bytes").cast("long").alias("n_bytes")),
        on="doc_id",
    )
    counts = F.transform(
        "features",
        lambda f: F.round(f.cast("double") * F.col("n_bytes")).cast("long"),
    )
    c = feats.select("doc_id", "n_bytes", counts.alias("c"))
    weighted = F.aggregate(
        F.zip_with(
            "c",
            F.sequence(F.lit(1), F.lit(32)),
            lambda a, b: a * b.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return c.select(
        "doc_id",
        "n_bytes",
        F.element_at("c", 5).alias("c_bin4"),
        F.element_at("c", 13).alias("c_bin12"),
        F.element_at("c", 14).alias("c_bin13"),
        F.element_at("c", 15).alias("c_bin14"),
        weighted.alias("wsum"),
    ).orderBy("doc_id")


def q_motif_planted_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL MDL pipeline pinned cross-engine (A4/A5/A9/A11/A12 end to
    end): MotifExtractor sampling + node-disjoint selection +
    score_motifs' instance-loop scoring, on the deterministic planted
    13-node "4 triangles + hub" fixture (FIXTURES.md; shape from motive
    UPlainMotifExtractorTest.java:23-82).  The fixture is independent of
    sf_dir by design: the 4 planted triangles are the graph's ONLY
    triangles and are vertex-disjoint, so the selected occurrence set is
    provably {all 4} — which lets the DuckDB oracle re-derive the
    occurrences itself (triangle enumeration) and recompute the six-term
    naive-contraction codelength from scratch with lgamma, the
    MotifModelTest.java:540-641 exact-small-graph-golden pattern."""
    from motive_spark.mdl.score import score_motifs
    from motive_spark.motifs.extract import MotifExtractor

    pairs = [
        (0, 1), (1, 2), (2, 0),
        (3, 4), (4, 5), (5, 3),
        (6, 7), (7, 8), (8, 6),
        (9, 10), (10, 11), (11, 9),
        (12, 0), (12, 3), (12, 6), (12, 9),
    ]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    ext = MotifExtractor(
        edges, samples=800, min_size=3, max_size=3, min_freq=2,
        seed=7, directed=False,
    )
    tri_canon = 238  # canonical_form of the k=3 undirected triangle
    occ = ext.occurrences(canon=tri_canon)
    # pin the scale-out plan: this row exists to oracle-gate the
    # DISTRIBUTED instance-loop path (the local fast path is gated by
    # test_mdl's local-vs-distributed equality instead)
    scored = score_motifs(edges, occ, directed=False, strategy="distributed")
    return scored.select(
        F.lit("triangle").alias("motif"),
        F.col("k").cast("int").alias("k"),
        F.col("n_occurrences").cast("long").alias("n_occ"),
        F.round("size_er", 6).alias("size_er"),
        F.round("size_el", 6).alias("size_el"),
        F.round("factor_er", 6).alias("factor_er"),
        F.round("factor_el", 6).alias("factor_el"),
    )


def q_motif_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-node connected-subgraph census on the co-purchase graph:
    triangles vs open wedges (induced paths) — the exhaustive-k=3 analogue
    of the sampled motif frequency table."""
    from motive_spark.graph import degrees
    from motive_spark.kernels import triangle_count

    # within-query cache: orientation + degree pass both read und
    und = _und(spark, sf_dir).cache()
    tri = triangle_count(und).collect()[0][0]
    deg = degrees(und, directed=False)
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("w")
    ).collect()[0][0]
    return spark.createDataFrame(
        [("triangle", int(tri)), ("path", int(wedges - 3 * tri))],
        "motif string, n long",
    ).orderBy("motif")


def q_motif_k3_er_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDL arithmetic pinned cross-engine (A9/A10): for each exhaustive
    k=3 motif class, the ER codelength of the motif graph, the labels
    term over the real census count, and the shared ER baseline —
    closed-form lgamma expressions evaluated over distributed census
    counts (codes.prefix_bits/log2_choose ≡ the DuckDB lgamma oracle).
    Only the census aggregates (2 rows + n + m) touch the driver."""
    from motive_spark.graph import degrees
    from motive_spark.kernels import triangle_count
    from motive_spark.mdl import codes
    from motive_spark.mdl.models import er_bits

    und = _und(spark, sf_dir).cache()
    m = und.count()
    deg = degrees(und, directed=False)
    n = deg.count()
    tri = triangle_count(und).collect()[0][0]
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("w")
    ).collect()[0][0]
    census = [("path", 2, int(wedges - 3 * tri)), ("triangle", 3, int(tri))]
    base_er = float(er_bits(n, m, directed=False))
    rows = [
        (
            motif,
            n_occ,
            round(float(er_bits(3, m_motif, directed=False)), 4),
            # labels term at the largest REALIZABLE disjoint occurrence
            # count (node-disjoint k=3 instances cannot exceed n/3; the
            # raw census counts overlapping subgraphs)
            round(
                float(
                    codes.prefix_bits(n_occ)
                    + codes.log2_choose(min(n_occ, n // 3), n)
                ),
                4,
            ),
            round(base_er, 4),
        )
        for motif, m_motif, n_occ in census
    ]
    return spark.createDataFrame(
        rows,
        "motif string, n_occ long, sub_er double, labels_bits double, "
        "er_baseline double",
    ).orderBy("motif")


def _simhash_sql() -> str:
    votes = ", ".join(
        f"SUM(2 * ((strpos('0123456789abcdef', substr(h, {j}, 1)) - 1) % 2) - 1) AS s{j}"
        for j in range(1, 33)
    )
    bits = " || ".join(
        f"CASE WHEN s{j} > 0 THEN '1' ELSE '0' END" for j in range(1, 33)
    )
    return (
        "WITH "
        + _GRAM_SQL
        + ","
        + _grams_sql(2)
        + f""",
hashed AS (SELECT doc_id, md5(gram) AS h FROM grams),
sums AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, {bits} AS simhash FROM sums ORDER BY doc_id"""
    )


def _minhash_sql(num_hashes: int = 12, bands: int = 4) -> str:
    rows_per_band = num_hashes // bands
    mins = ", ".join(
        f"MIN(md5('{i}|' || gram)) AS h{i}" for i in range(num_hashes)
    )
    band_rows = []
    for b in range(bands):
        parts = " || '|' || ".join(
            f"h{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_rows.append(
            f"SELECT doc_id, {b} AS band, md5({parts}) AS key FROM sig"
        )
    return (
        "WITH "
        + _GRAM_SQL
        + ","
        + _grams_sql(3)
        + f""",
sig AS MATERIALIZED (SELECT doc_id, {mins} FROM grams GROUP BY doc_id),
buckets AS MATERIALIZED ({' UNION ALL '.join(band_rows)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_bands_shared
FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 ORDER BY 1, 2"""
    )


def _jaccard_sql(threshold: float = 0.15, max_df: int = 1000) -> str:
    return (
        "WITH "
        + _GRAM_SQL
        + ","
        + _grams_sql(3)
        + f""",
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
rare AS MATERIALIZED (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= {max_df}
),
g AS MATERIALIZED (SELECT doc_id, grams.gram FROM grams JOIN rare ON grams.gram = rare.gram),
shared AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(shared * 1.0 / (sa.n_grams + sb.n_grams - shared), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(shared * 1.0 / (sa.n_grams + sb.n_grams - shared), 6) >= {threshold}
ORDER BY doc_a, doc_b"""
    )


def _count_token_sql(token: str) -> str:
    needle = f" {token} "
    return (
        f"CAST((length(' ' || text || ' ') - "
        f"length(replace(' ' || text || ' ', '{needle}', ''))) / {len(needle)} AS BIGINT)"
    )


def _gopher_sql() -> str:
    """Full Gopher rule battery, mirroring
    datapipe.gopher_quality_filter expression-for-expression (the
    alphabetic-word test is lower(w) <> upper(w) in both engines — no
    regex semantics cross the boundary)."""
    from motive_spark.datapipe.text import STOPWORD_RULE_WORDS

    n_stop = " + ".join(
        f"(CASE WHEN {_count_token_sql(w)} > 0 THEN 1 ELSE 0 END)"
        for w in STOPWORD_RULE_WORDS
    )
    rules = {
        "rule_word_count": "(n_words >= 20 AND n_words <= 100000)",
        "rule_word_len": "(n_alpha * 1.0 / n_words >= 3.0 AND n_alpha * 1.0 / n_words <= 10.0)",
        "rule_symbols": "(n_symbols * 1.0 / n_words <= 0.1)",
        "rule_repetition": "(n_distinct * 1.0 / n_words >= 0.3)",
        "rule_bullets": "(n_bullets * 1.0 / n_lines <= 0.9)",
        "rule_ellipsis": "(n_ellipsis * 1.0 / n_lines <= 0.3)",
        "rule_stopwords": "(n_stop >= 2)",
        "rule_dup_lines": "(1.0 - n_dlines * 1.0 / n_lines <= 0.3)",
        "rule_alpha_words": "(n_alpha_words * 1.0 / n_words >= 0.8)",
    }
    rule_sel = ",\n  ".join(f"{e} AS {n}" for n, e in rules.items())
    passes = " AND ".join(rules.values())
    return f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         length(replace(text, ' ', '')) AS n_alpha,
         len(string_split_regex(text, '[^A-Za-z0-9\\s]+')) - 1 AS n_symbols,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         string_split(text, chr(10)) AS lines,
         string_split(text, ' ') AS toks,
         ({n_stop}) AS n_stop
  FROM documents
),
u AS (
  SELECT doc_id, n_words, n_alpha, n_symbols, n_distinct, n_stop,
         len(lines) AS n_lines,
         len(list_filter(lines, l -> substr(l, 1, 2) IN ('- ', '* ')
                                     OR substr(l, 1, 1) = '•')) AS n_bullets,
         len(list_filter(lines, l -> right(l, 3) = '...'
                                     OR right(l, 1) = '…')) AS n_ellipsis,
         len(list_distinct(lines)) AS n_dlines,
         len(list_filter(toks, w -> lower(w) <> upper(w))) AS n_alpha_words
  FROM t
)
SELECT doc_id, n_words,
  ROUND(n_alpha * 1.0 / n_words, 6) AS mean_word_len,
  ROUND(n_symbols * 1.0 / n_words, 6) AS symbol_ratio,
  ROUND(n_distinct * 1.0 / n_words, 6) AS distinct_ratio,
  ROUND(n_bullets * 1.0 / n_lines, 6) AS bullet_ratio,
  ROUND(n_ellipsis * 1.0 / n_lines, 6) AS ellipsis_ratio,
  CAST(n_stop AS INT) AS n_stopwords,
  ROUND(1.0 - n_dlines * 1.0 / n_lines, 6) AS dup_line_ratio,
  ROUND(n_alpha_words * 1.0 / n_words, 6) AS alpha_ratio,
  {rule_sel},
  ({passes}) AS passes
FROM u ORDER BY doc_id"""


def _langid_sql() -> str:
    """Hashed char-trigram NB language ID in DuckDB: the same padded
    trigram -> md5-hash bucket -> integer weight-sum -> strict-> argmax
    fold as datapipe.detect_language_ngram — integer quantization makes
    the scores exact in both engines regardless of summation order."""
    from motive_spark.datapipe.langid_model import LANGS, N_BUCKETS, WEIGHTS

    w_defs = ",\n".join(
        f"  w_{lang} AS (SELECT {WEIGHTS[lang]!r} AS w)".replace("'", "")
        for lang in LANGS
    )
    score_sel = ",\n".join(
        f"    list_sum(list_transform(bk, b -> w_{lang}.w[CAST(b + 1 AS INT)]))"
        f" AS s_{lang}"
        for lang in LANGS
    )
    w_from = ", ".join(f"w_{lang}" for lang in LANGS)
    expr_best = f"'{LANGS[0]}'"
    expr_s = f"s_{LANGS[0]}"
    for lang in LANGS[1:]:  # later wins only on strict >, as in Spark
        expr_best = f"CASE WHEN s_{lang} > ({expr_s}) THEN '{lang}' ELSE ({expr_best}) END"
        expr_s = f"CASE WHEN s_{lang} > ({expr_s}) THEN s_{lang} ELSE ({expr_s}) END"
    return f"""WITH
{w_defs},
t AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
g AS (
  SELECT doc_id,
    list_transform(
      range(1, GREATEST(length(p) - 2, 1) + 1),
      i -> ('0x' || substr(md5(substr(p, CAST(i AS INT), 3)), 1, 4))::BIGINT
           % {N_BUCKETS}
    ) AS bk
  FROM t
),
s AS (
  SELECT doc_id,
{score_sel}
  FROM g, {w_from}
)
SELECT doc_id, {expr_best} AS pred_lang FROM s ORDER BY doc_id"""


LATE_SPLIT_DATE = "2024-01-11"
LATE_DELAY = "72 hours"


def q_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data contract: append-mode windowed counts over a
    deterministic 3-batch drain (on-time early / on-time late / odd-id
    backfill).  Old windows show on-time-only counts (backfill rows
    dropped — their windows were already evicted), middle windows show
    merged counts, and the sub-watermark tail is withheld; the oracle
    replays the measured semantics in closed form."""
    from motive_spark.streaming import stream_late_data_windowed_counts

    return stream_late_data_windowed_counts(
        spark,
        f"{sf_dir}/events.parquet",
        split_date=LATE_SPLIT_DATE,
        window="1 day",
        delay=LATE_DELAY,
    ).orderBy("window_start")


_STREAM_LATE_SQL = f"""
WITH b0max AS (
  SELECT MAX(ts) AS mx FROM events
  WHERE event_id % 2 = 0 AND strftime(ts, '%Y-%m-%d') < '{LATE_SPLIT_DATE}'
),
gmax AS (SELECT MAX(ts) AS mx FROM events),
counted AS (
  SELECT ts, value FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT e.ts, e.value FROM events e, b0max
  WHERE e.event_id % 2 = 1
    AND date_trunc('day', e.ts) + INTERVAL 1 DAY
        > b0max.mx - INTERVAL 72 HOURS
),
aggd AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start,
         date_trunc('day', ts) + INTERVAL 1 DAY AS wend,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_cents
  FROM counted GROUP BY 1, 2
)
SELECT window_start, n_events, sum_value_cents
FROM aggd, gmax WHERE wend <= gmax.mx - INTERVAL 72 HOURS
ORDER BY window_start"""


SSJ_WINDOW = "30 minutes"


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual-stream inner join: even- and odd-id event halves arrive as
    two watermarked streams, joined on user within ±30 min event time;
    an inner time-bounded join's matched set is batch-boundary
    independent, so the oracle replays it as one static join."""
    from motive_spark.streaming import stream_stream_join_counts

    return stream_stream_join_counts(
        spark, f"{sf_dir}/events.parquet", window=SSJ_WINDOW
    ).orderBy("user_id")


_STREAM_STREAM_SQL = """
SELECT a.user_id,
       COUNT(*) AS n_pairs,
       CAST(SUM(CAST(round(a.value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events a
JOIN events b
  ON b.user_id = a.user_id
 AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
 AND b.ts >= a.ts - INTERVAL 30 MINUTE
 AND b.ts <= a.ts + INTERVAL 30 MINUTE
GROUP BY 1 ORDER BY 1"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming prefix-fingerprint dedup groups: readStream
    over documents.parquet, stateful complete-mode aggregation drained
    by an availableNow trigger through a foreachBatch parquet sink —
    the streaming tier's cross-engine gate (the result is independent
    of batch arrival order, so DuckDB replays it as a plain GROUP BY)."""
    from motive_spark.streaming import stream_prefix_dedup_groups

    return stream_prefix_dedup_groups(
        spark, f"{sf_dir}/documents.parquet", n_prefix_tokens=3
    ).orderBy("content_key")


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join enrichment: streaming events joined per
    micro-batch against the static broadcast customer dimension,
    aggregated per (segment, event_type), drained exactly-once
    (availableNow + foreachBatch parquet) — third streaming contract
    row; batch-order-independent, so DuckDB replays it as a plain
    JOIN + GROUP BY."""
    from motive_spark.streaming import stream_static_enriched_counts

    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return stream_static_enriched_counts(
        spark, f"{sf_dir}/events.parquet", customers
    ).orderBy("c_mktsegment", "event_type")


def q_orders_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-priority price percentiles from the cents histogram —
    no per-group sort; integer target ranks, bit-exact cross-engine."""
    from motive_spark.datapipe import group_percentiles

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return group_percentiles(
        orders,
        "o_orderpriority",
        "cents",
        percentiles=[("p25", 1, 4), ("p50", 1, 2), ("p95", 19, 20)],
    ).orderBy("o_orderpriority")


APPROX_PCT_BIN_CENTS = 50_000  # $500-wide sketch bins


def q_lineitem_approx_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binned-sketch percentiles on lineitem prices: bounded-state
    approximate quantiles (error ≤ one $500 bin) — the scale path when
    the exact distinct-value histogram is too wide.  Deterministic
    (no sampling), so the oracle replays the sketch bit-for-bit."""
    from motive_spark.datapipe import approx_percentiles_binned

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return approx_percentiles_binned(
        li,
        "l_returnflag",
        "cents",
        bin_width=APPROX_PCT_BIN_CENTS,
        percentiles=[("p50", 1, 2), ("p95", 19, 20), ("p99", 99, 100)],
    ).orderBy("l_returnflag")


def _approx_percentiles_sql(width: int = APPROX_PCT_BIN_CENTS) -> str:
    return f"""
WITH h AS (
  SELECT l_returnflag AS g,
         v - ((v % {width} + {width}) % {width}) AS edge, COUNT(*) AS c
  FROM (SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        FROM lineitem)
  GROUP BY 1, 2
),
cum AS (
  SELECT g, edge,
         SUM(c) OVER (PARTITION BY g ORDER BY edge
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM h
)
SELECT g AS l_returnflag,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       MIN(CASE WHEN cum >= (1 * n + 1) // 2 THEN edge END) AS p50,
       MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN edge END) AS p95,
       MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN edge END) AS p99
FROM cum GROUP BY g ORDER BY g"""


BM25_QUERY = ["the", "model", "data", "with"]


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed query; per-term contributions sum
    left-to-right over the literal query order, so the float score is
    bit-identical cross-engine."""
    from motive_spark.datapipe import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_topk(docs, BM25_QUERY, top_k=20).orderBy("rank")


SAMPLE_EN_FRAC = 0.3
SAMPLE_SEED_THIN = 3
SAMPLE_SEED_RANK = 5
SAMPLE_QUOTA = 25


def q_docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-mix sampling: deterministically thin the dominant
    language (en kept at 0.3 via the md5-threshold Bernoulli filter —
    a zero-shuffle predicate), then take an EXACT 25-doc quota per
    language ranked by an independent md5 draw.  Both stages are pure
    functions of (doc_id, seed), so the oracle replays the sample
    row-for-row."""
    from motive_spark.datapipe import hash_sample, stratified_topn

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    thinned = hash_sample(
        docs,
        frac=1.0,
        key_cols=["doc_id"],
        seed=SAMPLE_SEED_THIN,
        frac_by={"en": SAMPLE_EN_FRAC},
        strata_col="lang",
    )
    return (
        stratified_topn(
            thinned,
            ["lang"],
            n=SAMPLE_QUOTA,
            key_cols=["doc_id"],
            seed=SAMPLE_SEED_RANK,
        )
        .select("lang", "doc_id", "strat_rank")
        .orderBy("lang", "strat_rank")
    )


def _stratified_sample_sql() -> str:
    t_en = int(SAMPLE_EN_FRAC * (1 << 32))
    t_def = 1 << 32
    return f"""
WITH kept AS MATERIALIZED (
  SELECT doc_id, lang FROM documents
  WHERE ('0x' || substr(md5(doc_id || '|{SAMPLE_SEED_THIN}'), 1, 8))::BIGINT <
        CASE WHEN lang = 'en' THEN {t_en} ELSE {t_def} END
),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(doc_id || '|{SAMPLE_SEED_RANK}') ASC,
                    CAST(doc_id AS VARCHAR) ASC
         ) AS strat_rank
  FROM kept
)
SELECT lang, doc_id, CAST(strat_rank AS INT) AS strat_rank
FROM ranked WHERE strat_rank <= {SAMPLE_QUOTA} ORDER BY lang, strat_rank"""


LINKAGE_MAX_DIST = 2
LINKAGE_TOP = 200
LINKAGE_MAX_BLOCK = 5000


def q_part_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage candidates over part names: block on (last name
    token, length//4 bucket), compare within blocks by levenshtein,
    keep fuzzy (distance 1-2) pairs — the blocking bounds the
    comparison space to Σ block², the df-style cap drops power blocks.
    Top-200 by (distance, keys) via TakeOrdered; rank stamped over the
    survivors only."""
    from motive_spark.datapipe import blocked_link_pairs

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    pairs = blocked_link_pairs(
        part,
        key_col="p_partkey",
        name_col="p_name",
        block_exprs=[
            F.element_at(F.split(F.col("p_name"), " "), -1),
            (F.length("p_name") / 4).cast("long"),
        ],
        max_distance=LINKAGE_MAX_DIST,
        min_distance=1,
        max_block_size=LINKAGE_MAX_BLOCK,
        carry_cols=["p_brand"],
    )
    top = (
        pairs.select(
            "a_p_partkey",
            "b_p_partkey",
            "a_p_name",
            "b_p_name",
            "distance",
            (F.col("a_p_brand") == F.col("b_p_brand")).alias("same_brand"),
        )
        .orderBy("distance", "a_p_partkey", "b_p_partkey")
        .limit(LINKAGE_TOP)
    )
    win = Window.orderBy("distance", "a_p_partkey", "b_p_partkey")
    return top.withColumn("rank", F.row_number().over(win))


_LINKAGE_SQL = f"""
WITH p AS MATERIALIZED (
  SELECT p_partkey, p_name, p_brand,
         string_split(p_name, ' ')[-1] || chr(31)
           || CAST(length(p_name) // 4 AS VARCHAR) AS blk
  FROM part
),
sized AS (
  SELECT p.* FROM p
  JOIN (SELECT blk, COUNT(*) AS bc FROM p GROUP BY 1
        HAVING COUNT(*) <= {LINKAGE_MAX_BLOCK}) s USING (blk)
),
pairs AS (
  SELECT a.p_partkey AS a_p_partkey, b.p_partkey AS b_p_partkey,
         a.p_name AS a_p_name, b.p_name AS b_p_name,
         levenshtein(a.p_name, b.p_name) AS distance,
         (a.p_brand = b.p_brand) AS same_brand
  FROM sized a JOIN sized b
    ON a.blk = b.blk AND a.p_partkey < b.p_partkey
  WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND {LINKAGE_MAX_DIST}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY distance, a_p_partkey, b_p_partkey) AS rank
  FROM pairs
)
SELECT a_p_partkey, b_p_partkey, a_p_name, b_p_name,
       CAST(distance AS INT) AS distance, same_brand,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {LINKAGE_TOP} ORDER BY rank"""


WSAMPLE_N = 64
WSAMPLE_SEED = 7


def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sample without replacement: 64
    docs drawn with probability proportional to length (n_chars) via
    the md5-keyed A-ES draw — deterministic, so the oracle replays the
    exact sample.  Length-weighted draws are the curation primitive
    for token-budgeted corpus mixes (sampling documents ∝ tokens
    contributed, not uniformly)."""
    from motive_spark.datapipe import weighted_sample_topn

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        weighted_sample_topn(
            docs,
            n=WSAMPLE_N,
            weight_col="n_chars",
            key_cols=["doc_id"],
            seed=WSAMPLE_SEED,
        )
        .select("doc_id", "lang", "n_chars", "aes_rank")
        .orderBy("aes_rank")
    )


def _weighted_sample_sql(n: int = WSAMPLE_N, seed: int = WSAMPLE_SEED) -> str:
    return f"""
WITH keyed AS MATERIALIZED (
  SELECT doc_id, lang, n_chars,
         ROUND(ln((('0x' || substr(md5(doc_id || '|{seed}'), 1, 8))::BIGINT
                   + 1) / 4294967296.0)
               / CAST(n_chars AS DOUBLE), 9) AS k
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (
           ORDER BY k DESC, CAST(doc_id AS VARCHAR) ASC
         ) AS aes_rank
  FROM keyed
)
SELECT doc_id, lang, n_chars, CAST(aes_rank AS INT) AS aes_rank
FROM ranked WHERE aes_rank <= {n} ORDER BY aes_rank"""


BLOOM_BAL = 9000.0
BLOOM_BITS = 512
BLOOM_HASHES = 2


def q_orders_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime pruning, audited: rich-customer keys build
    a deliberately small (512-bit, 2-hash) Bloom filter; the orders
    fact is pruned through it pre-shuffle.  The single summary row
    carries the exact pass/true/false-positive accounting — the audit
    a pipeline runs before trusting a runtime filter at scale."""
    from motive_spark.datapipe import bloom_bits, bloom_semi_join

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = cust.where(F.col("c_acctbal") >= BLOOM_BAL).select(
        F.col("c_custkey").alias("o_custkey")
    )
    bloom = bloom_bits(
        dim, "o_custkey", n_hashes=BLOOM_HASHES, n_bits=BLOOM_BITS
    )
    passed = bloom_semi_join(
        orders, bloom, "o_custkey", n_hashes=BLOOM_HASHES, n_bits=BLOOM_BITS
    )
    true_rows = orders.join(F.broadcast(dim), "o_custkey", "semi")
    return (
        passed.agg(
            F.count(F.lit(1)).alias("n_pass_rows"),
            F.countDistinct("o_custkey").alias("n_pass_keys"),
        )
        .crossJoin(
            true_rows.agg(
                F.count(F.lit(1)).alias("n_true_rows"),
                F.countDistinct("o_custkey").alias("n_true_keys"),
            )
        )
        .crossJoin(dim.agg(F.count(F.lit(1)).alias("n_dim_keys")))
        .crossJoin(
            orders.agg(
                F.count(F.lit(1)).alias("n_fact_rows"),
                F.countDistinct("o_custkey").alias("n_fact_keys"),
            )
        )
        .select(
            "n_dim_keys",
            "n_fact_rows",
            "n_fact_keys",
            "n_pass_rows",
            "n_pass_keys",
            "n_true_rows",
            "n_true_keys",
            (F.col("n_pass_keys") - F.col("n_true_keys")).alias(
                "n_false_pos_keys"
            ),
        )
    )


def _bloom_prune_sql(
    bal: float = BLOOM_BAL, bits: int = BLOOM_BITS, k: int = BLOOM_HASHES
) -> str:
    probe = " UNION ALL ".join(
        f"SELECT o_custkey, {j} AS h, "
        f"(('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '|{j}'), 1, 8))"
        f"::BIGINT) % {bits} AS bit FROM fk"
        for j in range(k)
    )
    bitsrc = " UNION ALL ".join(
        f"SELECT {j} AS h, "
        f"(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '|{j}'), 1, 8))"
        f"::BIGINT) % {bits} AS bit FROM dim"
        for j in range(k)
    )
    return f"""
WITH dim AS MATERIALIZED (
  SELECT c_custkey FROM customer WHERE c_acctbal >= {bal}
),
bloom AS MATERIALIZED (SELECT DISTINCT h, bit FROM ({bitsrc})),
fk AS MATERIALIZED (SELECT DISTINCT o_custkey FROM orders),
passing AS MATERIALIZED (
  SELECT o_custkey FROM ({probe}) p
  JOIN bloom USING (h, bit)
  GROUP BY o_custkey HAVING COUNT(*) = {k}
),
pass_rows AS (
  SELECT COUNT(*) AS n_pass_rows, COUNT(DISTINCT o_custkey) AS n_pass_keys
  FROM orders WHERE o_custkey IN (SELECT o_custkey FROM passing)
),
true_rows AS (
  SELECT COUNT(*) AS n_true_rows, COUNT(DISTINCT o_custkey) AS n_true_keys
  FROM orders WHERE o_custkey IN (SELECT c_custkey FROM dim)
)
SELECT CAST((SELECT COUNT(*) FROM dim) AS BIGINT) AS n_dim_keys,
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_fact_rows,
       CAST((SELECT COUNT(*) FROM fk) AS BIGINT) AS n_fact_keys,
       CAST(n_pass_rows AS BIGINT) AS n_pass_rows,
       CAST(n_pass_keys AS BIGINT) AS n_pass_keys,
       CAST(n_true_rows AS BIGINT) AS n_true_rows,
       CAST(n_true_keys AS BIGINT) AS n_true_keys,
       CAST(n_pass_keys - n_true_keys AS BIGINT) AS n_false_pos_keys
FROM pass_rows, true_rows"""


HOTKEYS_TOP = 10


def q_lineitem_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew PRE-PASS as its own gated row: exact top-10 partkeys
    by lineitem row count (map-side-combinable aggregate — the shuffle
    carries per-partition partials, never rows), deterministic
    tie-break by key."""
    from motive_spark.datapipe import top_keys_by_count

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = top_keys_by_count(li, ["l_partkey"], top_k=HOTKEYS_TOP)
    win = Window.orderBy(F.desc("n_rows"), "l_partkey")
    return out.withColumn("rank", F.row_number().over(win))


_HOT_KEYS_SQL = f"""
SELECT l_partkey, n_rows, CAST(rank AS INT) AS rank FROM (
  SELECT l_partkey, COUNT(*) AS n_rows,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, l_partkey) AS rank
  FROM lineitem GROUP BY 1
) WHERE rank <= {HOTKEYS_TOP} ORDER BY rank"""


SALT_N = 8


def q_orders_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew handling: lineitem⋈orders through the salted-join
    operator (md5 row salt spreads each key over 8 sub-keys; the
    orders side replicates 8×), aggregated to revenue per priority —
    row-for-row identical to the plain join, which is exactly what the
    oracle runs."""
    from motive_spark.datapipe import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("ep_c"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_c"),
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, on="l_orderkey", n_salts=SALT_N)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("ep_c") * (100 - F.col("disc_c"))).alias(
                "revenue_c4"
            ),
        )
        .orderBy("o_orderpriority")
    )


_SALTED_JOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_c4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1"""


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: per
    user, consecutive event-type pairs under deterministic (ts,
    event_id) order; P(next|cur) as one exact-integer ratio rounded to
    6 dp.  One shuffle on user, one bounded window, one groupBy."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(tot, "cur")
        .select(
            "cur",
            "nxt",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


_TRANSITIONS_SQL = """
WITH pairs AS MATERIALIZED (
  SELECT cur, nxt, COUNT(*) AS n FROM (
    SELECT event_type AS cur,
           LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS nxt
    FROM events
  ) WHERE nxt IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS tot FROM pairs GROUP BY 1)
SELECT p.cur, p.nxt, CAST(p.n AS BIGINT) AS n,
       ROUND(p.n * 1.0 / t.tot, 6) AS p
FROM pairs p JOIN tot t USING (cur) ORDER BY cur, nxt"""


def q_events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 intervals from the event change log: per user the
    event_type attribute's validity windows, no-op updates collapsed,
    (ts, event_id) ordering; bounds in integer micros (TZ-free)."""
    from motive_spark.datapipe import scd2_intervals

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return scd2_intervals(
        ev,
        key_col="user_id",
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_col="event_id",
    ).orderBy("user_id", "version")


_SCD2_SQL = """
WITH base AS MATERIALIZED (
  SELECT user_id AS k, epoch_us(ts) AS us, event_id, event_type
  FROM events
),
flagged AS (
  SELECT *,
         LAG(event_type) OVER (PARTITION BY k ORDER BY us, event_id)
           AS prev_type,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY us, event_id) AS rn
  FROM base
),
kept AS MATERIALIZED (
  SELECT * FROM flagged
  WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
)
SELECT k AS user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY us, event_id)
            AS INT) AS version,
       us AS valid_from_us,
       LEAD(us) OVER (PARTITION BY k ORDER BY us, event_id)
         AS valid_to_us,
       LEAD(us) OVER (PARTITION BY k ORDER BY us, event_id) IS NULL
         AS is_current,
       event_type
FROM kept ORDER BY user_id, version"""


ASSOC_MIN_SUP = 3
ASSOC_TOP_K = 50
ASSOC_MAX_BASKET = 200


def q_orders_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Apriori association rules over order baskets: exact
    integer supports, Apriori pruning before the metric join,
    basket-size cap; confidence/lift rounded to 6 dp before the
    lift-ranked top-50."""
    from motive_spark.datapipe import association_rules

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return association_rules(
        li,
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_support=ASSOC_MIN_SUP,
        top_k=ASSOC_TOP_K,
        max_basket_size=ASSOC_MAX_BASKET,
    ).orderBy("rank")


_ASSOC_SQL = f"""
WITH bi AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
),
kept AS MATERIALIZED (
  SELECT bi.* FROM bi
  JOIN (SELECT b, COUNT(*) AS bs FROM bi GROUP BY 1
        HAVING COUNT(*) <= {ASSOC_MAX_BASKET}) s USING (b)
),
n AS (SELECT COUNT(DISTINCT b) AS nb FROM kept),
ic AS MATERIALIZED (SELECT i, COUNT(*) AS ic FROM kept GROUP BY 1),
pairs AS MATERIALIZED (
  SELECT a.i AS ia, c.i AS ib, COUNT(*) AS pc
  FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i
  GROUP BY 1, 2 HAVING COUNT(*) >= {ASSOC_MIN_SUP}
),
directed AS (
  SELECT ia AS antecedent, ib AS consequent, pc FROM pairs
  UNION ALL
  SELECT ib AS antecedent, ia AS consequent, pc FROM pairs
),
rules AS (
  SELECT d.antecedent, d.consequent,
         CAST(d.pc AS BIGINT) AS pair_count,
         CAST(x.ic AS BIGINT) AS ante_count,
         CAST(y.ic AS BIGINT) AS cons_count,
         ROUND(d.pc * 1.0 / x.ic, 6) AS confidence,
         ROUND(CAST(d.pc * n.nb AS DOUBLE) / (x.ic * y.ic), 6) AS lift
  FROM directed d
  JOIN ic x ON x.i = d.antecedent
  JOIN ic y ON y.i = d.consequent
  CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY lift DESC, confidence DESC, antecedent, consequent) AS rank
  FROM rules
)
SELECT antecedent, consequent, pair_count, ante_count, cons_count,
       confidence, lift, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {ASSOC_TOP_K} ORDER BY rank"""


KMV_K = 48
KMV_LANG_A = "en"
KMV_LANG_B = "de"


def q_docs_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta-style) distinct-token estimate per language: the k
    smallest md5 digests of each language's token set; exact below k,
    (k-1)/u_k above — every operand exact, so the oracle replays the
    estimate to the rounded digit."""
    from motive_spark.datapipe import kmv_distinct, word_ngrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = word_ngrams(docs.select("doc_id", "text"), 2).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("lang", F.col("gram").alias("token"))
    return kmv_distinct(toks, "lang", "token", k=KMV_K).orderBy("lang")


def q_docs_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra: |en|, |de|, |en∪de|, |en∩de| of the
    token sets estimated from the two KMV sketches alone (union = merged
    k-min; intersection = both-membership rate inside the union
    sketch × union estimate)."""
    from motive_spark.datapipe import kmv_set_ops, word_ngrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = word_ngrams(docs.select("doc_id", "text"), 2).join(
        docs.select("doc_id", "lang"), "doc_id"
    ).select("lang", F.col("gram").alias("token"))
    return kmv_set_ops(
        toks, "lang", "token", KMV_LANG_A, KMV_LANG_B, k=KMV_K
    )


def _kmv_sketch_sql(lang_filter: str = "") -> str:
    """Shared CTE body: per-language ascending distinct-digest lists
    over word BIGRAMS (the per-language vocabulary is only ~31 words;
    bigrams give ~900 distinct keys per language, so the contract
    exercises the (k-1)/u_k estimator branch, not just the exact
    below-k path).  Grams match dedup.word_ngrams / _grams_sql(2)."""
    return (
        _GRAM_SQL
        + ","
        + _grams_sql(2)
        + f""",
toksk AS MATERIALIZED (
  SELECT DISTINCT d.lang, md5(g.gram) AS h
  FROM grams g JOIN documents d USING (doc_id)
  WHERE 1 = 1 {lang_filter}
),
ranked AS (
  SELECT lang, h,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS r
  FROM toksk
)"""
    )


_KMV_EST = (
    "CASE WHEN n_seen < {k} THEN ROUND(CAST(n_seen AS DOUBLE), 4) "
    "ELSE ROUND(({k} - 1) / (('0x' || substr(kth, 1, 15))::BIGINT "
    "/ 1152921504606846976.0), 4) END"
)


def _kmv_distinct_sql(k: int = KMV_K) -> str:
    est = _KMV_EST.format(k=k)
    return (
        "WITH "
        + _kmv_sketch_sql()
        + f""",
sk AS (
  SELECT lang, COUNT(*) AS n_seen, MAX(CASE WHEN r = {k} THEN h END) AS kth
  FROM ranked WHERE r <= {k} GROUP BY lang
)
SELECT lang, {est} AS est_distinct,
       CAST(n_seen AS BIGINT) AS sketch_size
FROM sk ORDER BY lang"""
    )


def _kmv_setops_sql(
    k: int = KMV_K, a: str = KMV_LANG_A, b: str = KMV_LANG_B
) -> str:
    est = _KMV_EST.format(k=k)
    return (
        "WITH "
        + _kmv_sketch_sql(f"AND lang IN ('{a}', '{b}')")
        + f""",
kmins AS MATERIALIZED (SELECT lang, h FROM ranked WHERE r <= {k}),
sk AS (
  SELECT lang, COUNT(*) AS n_seen, MAX(CASE WHEN r = {k} THEN h END) AS kth
  FROM ranked WHERE r <= {k} GROUP BY lang
),
ea AS (SELECT {est} AS est_a FROM sk WHERE lang = '{a}'),
eb AS (SELECT {est} AS est_b FROM sk WHERE lang = '{b}'),
merged AS (
  SELECT h, MAX(CASE WHEN lang = '{a}' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN lang = '{b}' THEN 1 ELSE 0 END) AS in_b
  FROM kmins GROUP BY h
),
topu AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY h) AS r FROM merged
  ) WHERE r <= {k}
),
us AS (
  SELECT COUNT(*) AS n_seen, MAX(CASE WHEN r = {k} THEN h END) AS kth,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
  FROM topu
)
SELECT ea.est_a, eb.est_b, {est} AS est_union,
       ROUND(n_both * 1.0 / n_seen * ({est}), 4) AS est_intersection
FROM us, ea, eb"""
    )


CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOP_K = 32


def q_text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: top-32 exact tokens annotated
    with the 4×1024 CMS estimate and overestimate — the sketch audit
    (estimate ≥ exact always); md5 row hashes make the sketch
    cell-identical cross-engine."""
    from motive_spark.datapipe import heavy_hitters_cms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return heavy_hitters_cms(
        docs, top_k=CMS_TOP_K, depth=CMS_DEPTH, width=CMS_WIDTH
    ).orderBy("rank")


def _heavy_hitters_sql(
    top_k: int = CMS_TOP_K, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    probe_rows = " UNION ALL ".join(
        f"SELECT token, {j} AS row_idx, "
        f"(('0x' || substr(md5(token || '|{j}'), 1, 8))::BIGINT) % {width}"
        f" AS bucket FROM top"
        for j in range(depth)
    )
    cell_rows = " UNION ALL ".join(
        f"SELECT {j} AS row_idx, "
        f"(('0x' || substr(md5(token || '|{j}'), 1, 8))::BIGINT) % {width}"
        f" AS bucket, cnt FROM counts"
        for j in range(depth)
    )
    return f"""
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
),
counts AS MATERIALIZED (
  SELECT token, COUNT(*) AS cnt FROM toks WHERE token <> '' GROUP BY 1
),
cms AS MATERIALIZED (
  SELECT row_idx, bucket, CAST(SUM(cnt) AS BIGINT) AS cell
  FROM ({cell_rows}) GROUP BY 1, 2
),
top AS MATERIALIZED (
  SELECT token, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank
  FROM counts ORDER BY cnt DESC, token ASC LIMIT {top_k}
),
probes AS ({probe_rows}),
est AS (
  SELECT p.token,
         CAST(MIN(COALESCE(c.cell, 0)) AS BIGINT) AS cms_estimate
  FROM probes p LEFT JOIN cms c USING (row_idx, bucket)
  GROUP BY 1
)
SELECT t.token, CAST(t.cnt AS BIGINT) AS exact_count, e.cms_estimate,
       CAST(e.cms_estimate - t.cnt AS BIGINT) AS overestimate,
       CAST(t.rank AS INT) AS rank
FROM top t JOIN est e USING (token) ORDER BY rank"""


PMI_MIN_COUNT = 5
PMI_TOP_K = 50
_LN2 = 0.6931471805599453  # repr(math.log(2.0)) — embedded in BOTH engines


def q_text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-bigram collocations by PMI; all counts are
    exact integers, the log2 is one float expression per row from
    those integers, rounded to 6 dp before ranking (ln precedent:
    graph_link_prediction's Adamic-Adar term)."""
    from motive_spark.datapipe import collocations_pmi

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return collocations_pmi(docs, min_count=PMI_MIN_COUNT, top_k=PMI_TOP_K)


def _collocations_sql(
    min_count: int = PMI_MIN_COUNT, top_k: int = PMI_TOP_K
) -> str:
    return (
        "WITH "
        + _GRAM_SQL
        + f""",
uni AS MATERIALIZED (
  SELECT w, COUNT(*) AS c FROM toks WHERE w <> '' GROUP BY w
),
ntok AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
pair AS MATERIALIZED (
  SELECT t1.w AS w1, t2.w AS w2, COUNT(*) AS c12
  FROM toks t1
  JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.p = t1.p + 1
  WHERE t1.w <> '' AND t2.w <> ''
  GROUP BY 1, 2
),
nbi AS (SELECT CAST(SUM(c12) AS DOUBLE) AS b FROM pair)
SELECT p.w1, p.w2, p.c12, u1.c AS c1, u2.c AS c2,
       ROUND(ln(p.c12 * ntok.n * ntok.n / (nbi.b * u1.c * u2.c))
             / {_LN2!r}, 6) AS pmi
FROM pair p
JOIN uni u1 ON u1.w = p.w1
JOIN uni u2 ON u2.w = p.w2, ntok, nbi
WHERE p.c12 >= {min_count}
ORDER BY pmi DESC, p.w1, p.w2 LIMIT {top_k}"""
    )


CONTAM_N = 3
CONTAM_MIN_DF = 2


def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination screen: per doc, the fraction of its distinct
    3-grams occurring in >= 2 documents — exact integer pair + one
    rounded division; docs shorter than 3 tokens have no grams and no
    row (both engines)."""
    from motive_spark.datapipe import ngram_contamination

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_contamination(
        docs, n=CONTAM_N, min_df=CONTAM_MIN_DF
    ).orderBy("doc_id")


def _contamination_sql(n: int = CONTAM_N, min_df: int = CONTAM_MIN_DF) -> str:
    return (
        "WITH "
        + _GRAM_SQL
        + ","
        + _grams_sql(n)
        + f""",
dfreq AS MATERIALIZED (SELECT gram, COUNT(*) AS df FROM grams GROUP BY gram),
per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
shared AS (
  SELECT g.doc_id, COUNT(*) AS n_shared
  FROM grams g JOIN dfreq d ON d.gram = g.gram
  WHERE d.df >= {min_df}
  GROUP BY g.doc_id
)
SELECT p.doc_id, p.n_grams, COALESCE(s.n_shared, 0) AS n_shared,
       ROUND(COALESCE(s.n_shared, 0) * 1.0 / p.n_grams, 6)
         AS contamination_rate
FROM per_doc p LEFT JOIN shared s USING (doc_id) ORDER BY p.doc_id"""
    )


def _pii_inject(doc_id, text):
    """Deterministic PII fixture: the synthetic corpus carries no real
    PII, so the contract injects reproducible spans as pure functions
    of doc_id (replayed identically in the oracle) — the OPERATOR
    under test is the general redact_pii rewrite."""
    email = F.when(
        doc_id % 3 != 0,
        F.concat(
            F.lit(" reach user"),
            doc_id.cast("string"),
            F.lit("@mail.example.org"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        doc_id % 2 == 0,
        F.concat(
            F.lit(" from 192.168."),
            (doc_id % 256).cast("string"),
            F.lit("."),
            (doc_id % 40).cast("string"),
        ),
    ).otherwise(F.lit(""))
    card = F.concat(
        F.lit(" ref 4111"),
        F.lpad((doc_id % 1000000000).cast("string"), 12, "0"),
    )
    return F.concat(text, email, ip, card, F.lit(" end"))


def q_text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing contract: inject deterministic email/IPv4/long-
    number spans, redact with the fixed-order pattern battery, return
    per-category counts + md5 of the rewritten text (pins every
    replacement byte)."""
    from motive_spark.datapipe import redact_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", _pii_inject(F.col("doc_id"), F.col("text")).alias("text")
    )
    return redact_pii(docs).select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_longnum",
        F.md5("redacted").alias("red_md5"),
    ).orderBy("doc_id")


def _redact_pii_sql() -> str:
    from motive_spark.datapipe.text import PII_PATTERNS

    inject = (
        "text || CASE WHEN doc_id % 3 <> 0 THEN ' reach user' || doc_id"
        " || '@mail.example.org' ELSE '' END"
        " || CASE WHEN doc_id % 2 = 0 THEN ' from 192.168.'"
        " || (doc_id % 256) || '.' || (doc_id % 40) ELSE '' END"
        " || ' ref 4111' || lpad(CAST(doc_id % 1000000000 AS VARCHAR), 12, '0')"
        " || ' end'"
    )
    cols, expr = [], "t"
    for name, pat, repl in PII_PATTERNS:
        # DuckDB single-quoted literals keep backslashes verbatim — do
        # NOT double them (that would turn \. into a backslash class)
        esc = pat.replace("'", "''")
        cols.append(
            f"len(regexp_extract_all({expr}, '{esc}')) AS n_{name}"
        )
        expr = f"regexp_replace({expr}, '{esc}', '{repl}', 'g')"
    return f"""WITH injected AS (
  SELECT doc_id, {inject} AS t FROM documents
)
SELECT doc_id, {', '.join(cols)}, md5({expr}) AS red_md5
FROM injected ORDER BY doc_id"""


def q_text_tfidf_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine 'more like this': top-10 similar docs per query
    doc (doc_id < 5); idf quantized to integer thousandths so every
    weight/norm/dot is an exact integer sum — only the final cosine is
    a float, per-row from exact longs, rounded before ranking."""
    from motive_spark.datapipe import tfidf_similar_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # driver corpus has a dense 31-token vocabulary (median df 388/500),
    # so the stopword df-cap sits at 0.8: it still drops the most-common
    # token (df 402 > 400 = floor(500*0.8)) — the guard is exercised —
    # while leaving a real candidate set to score
    return tfidf_similar_docs(
        docs, n_queries=5, top_k=10, max_df_frac=0.8
    ).orderBy("query_id", "rank")


def _tfidf_similar_sql(
    n_queries: int = 5, top_k: int = 10, max_df_frac: float = 0.25
) -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
tf AS MATERIALIZED (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks WHERE tok <> ''
  GROUP BY doc_id, tok
),
nn AS (SELECT COUNT(*) AS n FROM documents),
df AS MATERIALIZED (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok
  HAVING COUNT(*) <= GREATEST(1, CAST(FLOOR((SELECT n FROM nn) * {max_df_frac}) AS BIGINT))
),
w AS MATERIALIZED (
  SELECT t.doc_id, t.tok,
         t.tf * CAST(round(1000.0 * ln(((SELECT n FROM nn) + 1.0) / (d.df + 1.0))) AS BIGINT) AS wt
  FROM tf t JOIN df d USING (tok)
),
norms AS MATERIALIZED (
  SELECT doc_id, SUM(wt * wt) AS norm_sq FROM w GROUP BY doc_id
),
qw AS (SELECT doc_id AS query_id, tok, wt AS qwt FROM w WHERE doc_id < {n_queries}),
dots AS (
  SELECT q.query_id, w.doc_id, SUM(q.qwt * w.wt) AS dot
  FROM qw q JOIN w ON q.tok = w.tok
  WHERE w.doc_id <> q.query_id
  GROUP BY q.query_id, w.doc_id
),
scored AS (
  SELECT d.query_id, d.doc_id,
         ROUND(d.dot / (sqrt(nq.norm_sq) * sqrt(nd.norm_sq)), 6) AS cos
  FROM dots d
  JOIN norms nq ON nq.doc_id = d.query_id
  JOIN norms nd ON nd.doc_id = d.doc_id
),
ranked AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, doc_id ASC) AS rank,
         cos
  FROM scored
)
SELECT query_id, doc_id, CAST(rank AS INT) AS rank, cos
FROM ranked WHERE rank <= {top_k} ORDER BY query_id, rank"""


def _bm25_sql(
    terms: list[str] | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> str:
    """Mirrors datapipe.bm25_topk expression-for-expression, including
    the left-fold summation order and the exact float literals."""
    if terms is None:
        terms = BM25_QUERY
    tf_sel = ",\n         ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        f" AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_sel = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    avgdl = "(sum_dl * 1.0 / n_docs)"
    expr = "0.0"
    for i in range(len(terms)):
        term = (
            f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
            f" * (tf_{i} * {k1 + 1.0})"
            f" / (tf_{i} + {k1} * ({1.0 - b} + {b} * dl / {avgdl}))"
        )
        expr = f"({expr} + {term})"
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         {tf_sel}
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
         {df_sel}
  FROM base
),
scored AS (
  SELECT doc_id, dl AS doc_len, ROUND({expr}, 6) AS bm25
  FROM base, stats
)
SELECT doc_id, doc_len, bm25, rank FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {top_k} ORDER BY rank"""


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact Lloyd's k-means (k=8, 3 iterations, md5-seeded):
    every assignment replayed bit-for-bit by the unrolled DuckDB
    oracle — quantized int64 vectors, round-half-up integer centroid
    means, ties to the smallest cluster."""
    from motive_spark.datapipe import kmeans_clusters

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans_clusters(emb, k=8, iters=3).orderBy("vec_id")


def _kmeans_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Unrolled Lloyd iterations mirroring datapipe.kmeans_clusters."""
    parts = [
        f"""WITH v AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * 1000000) AS BIGINT) + 1000000)
           AS v
  FROM embeddings
),
c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS j,
         v AS c
  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {k}
)"""
    ]
    for it in range(1, iters + 1):
        prev_c = f"c{it - 1}"
        parts.append(
            f""",a{it} AS MATERIALIZED (
  SELECT vec_id, v, j,
         list_sum(list_transform(range(1, {dim + 1}),
                  i -> (v[i] - c[i]) * (v[i] - c[i]))) AS d2
  FROM v CROSS JOIN {prev_c}
),
s{it} AS MATERIALIZED (
  SELECT vec_id, v, j AS cl, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
    FROM a{it}
  ) WHERE rn = 1
)"""
        )
        if it < iters:
            parts.append(
                f""",c{it} AS MATERIALIZED (
  SELECT {prev_c}.j, COALESCE(n.c, {prev_c}.c) AS c
  FROM {prev_c} LEFT JOIN (
    SELECT cl AS j, list(cd ORDER BY pos) AS c FROM (
      SELECT cl, pos, CAST((SUM(vd) + COUNT(*) // 2) // COUNT(*) AS BIGINT)
               AS cd
      FROM (SELECT cl, generate_subscripts(v, 1) AS pos, unnest(v) AS vd
            FROM s{it})
      GROUP BY cl, pos
    ) GROUP BY cl
  ) n ON n.j = {prev_c}.j
)"""
            )
    parts.append(
        f"""
SELECT vec_id, CAST(cl AS INT) AS cluster, CAST(d2 AS BIGINT) AS dist2
FROM s{iters} ORDER BY vec_id"""
    )
    return "".join(parts)


FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_H_US = 72 * 3600 * 1_000_000  # 72-hour conversion window


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→click→purchase funnel, first-touch semantics, 72 h
    horizon from the first view; epoch-microsecond integers
    throughout (timestamp gotcha discipline)."""
    from motive_spark.datapipe import funnel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        funnel(ev, FUNNEL_STEPS, FUNNEL_H_US)
        .withColumnRenamed("user", "user_id")
        .orderBy("user_id")
    )


def _funnel_sql(h_us: int = FUNNEL_H_US) -> str:
    s1, s2, s3 = FUNNEL_STEPS
    return f"""WITH ev AS MATERIALIZED (
  SELECT user_id AS uid, event_type AS t, epoch_us(ts) AS us FROM events
),
f1 AS (SELECT uid, MIN(us) AS t1_us FROM ev WHERE t = '{s1}' GROUP BY uid),
f2 AS (
  SELECT f1.uid, f1.t1_us,
         COALESCE(MIN(CASE WHEN e.us > f1.t1_us
                            AND e.us <= f1.t1_us + {h_us}
                           THEN e.us END), -1) AS t2_us
  FROM f1 LEFT JOIN ev e ON e.uid = f1.uid AND e.t = '{s2}'
  GROUP BY 1, 2
),
f3 AS (
  SELECT f2.uid, t1_us, t2_us,
         COALESCE(MIN(CASE WHEN t2_us >= 0 AND e.us > t2_us
                            AND e.us <= t1_us + {h_us}
                           THEN e.us END), -1) AS t3_us
  FROM f2 LEFT JOIN ev e ON e.uid = f2.uid AND e.t = '{s3}'
  GROUP BY 1, 2, 3
)
SELECT uid AS user_id,
       1 + CAST(t2_us >= 0 AS INT) + CAST(t3_us >= 0 AS INT) AS n_steps,
       t1_us, t2_us, t3_us
FROM f3 ORDER BY uid"""


AD_SEED = 7
AD_RMAX = 40
AD_NUMER = 0.697 * 32 * 32 * (1 << AD_RMAX)


def q_events_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic raw-HLL distinct-user estimate per event type
    (md5-derived registers, exact integer harmonic sum) joined with
    the exact count so the contract pins estimate AND ground truth."""
    from motive_spark.datapipe import approx_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = approx_distinct(
        ev, ["user_id"], ["event_type"], seed=AD_SEED, rmax=AD_RMAX
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return approx.join(exact, on="event_type").orderBy("event_type")


def _approx_distinct_sql(seed: int = AD_SEED, rmax: int = AD_RMAX) -> str:
    h1 = f"('0x' || substr(md5(user_id || '|{seed}'), 1, 8))::BIGINT"
    h2 = f"('0x' || substr(md5(user_id || '|{seed}'), 9, 8))::BIGINT"
    return f"""WITH regs AS MATERIALIZED (
  SELECT event_type, {h1} % 32 AS j,
         MAX(LEAST(CASE WHEN {h2} = 0 THEN {rmax}
                        ELSE 33 - LENGTH(bin({h2})) END, {rmax})) AS r
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         CAST(SUM(CAST(1 AS BIGINT) << ({rmax} - r)) AS BIGINT)
         + (32 - COUNT(*)) * (CAST(1 AS BIGINT) << {rmax}) AS s_int,
         CAST(32 - COUNT(*) AS INT) AS n_zero
  FROM regs GROUP BY 1
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT a.event_type, CAST(a.s_int AS BIGINT) AS s_int, a.n_zero,
       ROUND(CASE WHEN {AD_NUMER!r} / a.s_int <= 80.0 AND a.n_zero > 0
                  THEN 32.0 * ln(32.0 / a.n_zero)
                  ELSE {AD_NUMER!r} / a.s_int END, 6) AS approx_distinct,
       x.exact_distinct
FROM agg a JOIN exact x USING (event_type) ORDER BY a.event_type"""


RETENTION_P_US = 7 * 24 * 3600 * 1_000_000  # weekly cohorts
ROLLING_W_US = 6 * 3600 * 1_000_000  # 6-hour trailing window


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle over the events table —
    cohort by first-activity week (integer weeks since epoch),
    counted once per (cohort, offset) active week."""
    from motive_spark.datapipe import retention_cohorts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return retention_cohorts(ev, RETENTION_P_US).orderBy(
        "cohort_period", "offset_periods"
    )


def _retention_sql(p_us: int = RETENTION_P_US) -> str:
    return f"""WITH acts AS MATERIALIZED (
  SELECT DISTINCT user_id AS u, epoch_us(ts) // {p_us} AS p FROM events
),
cohort AS (SELECT u, MIN(p) AS c FROM acts GROUP BY u)
SELECT c.c AS cohort_period, a.p - c.c AS offset_periods,
       COUNT(*) AS n_users
FROM acts a JOIN cohort c USING (u)
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 6-hour velocity features (count + integer
    cents sum) via a RANGE frame over integer micros — tie-order
    independent, hence cross-engine hashable."""
    from motive_spark.datapipe import rolling_window_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return rolling_window_stats(ev, ROLLING_W_US).orderBy("event_id")


def _rolling_sql(w_us: int = ROLLING_W_US) -> str:
    return f"""WITH ev AS MATERIALIZED (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT user_id, event_id,
       COUNT(*) OVER w AS n_window,
       CAST(SUM(cents) OVER w AS BIGINT) AS cents_window
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN {w_us} PRECEDING AND CURRENT ROW)
ORDER BY event_id"""


RP_DIM = 8
RP_SEED = 11
RP_SCALE = 1_000_000


def q_emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign random projection 64 → 8 dims: +-1 matrix from md5
    parity, coordinates quantized to integer millionths first, so
    every output component is an exact BIGINT sum both engines
    reproduce."""
    from motive_spark.datapipe import random_projection

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return random_projection(
        emb, RP_DIM, seed=RP_SEED, scale=RP_SCALE
    ).orderBy("vec_id", "j")


def _random_projection_sql(
    out_dim: int = RP_DIM, seed: int = RP_SEED, scale: int = RP_SCALE
) -> str:
    return f"""WITH comps AS MATERIALIZED (
  SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(round(CAST(UNNEST(embedding) AS DOUBLE) * {scale}) AS BIGINT)
           AS xq
  FROM embeddings
),
proj AS MATERIALIZED (
  SELECT i.range AS i, CAST(j.range AS INT) AS j,
         CASE WHEN ('0x' || substr(
                md5(i.range || '|' || j.range || '|{seed}'), 1, 8
              ))::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM range(64) i, range({out_dim}) j
)
SELECT c.id AS vec_id, p.j, CAST(SUM(c.xq * p.s) AS BIGINT) AS y_q
FROM comps c JOIN proj p ON p.i = c.i
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap): one window pass + one
    aggregation; all time math in integer micros, value in cents."""
    from motive_spark.datapipe import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap_seconds=1800).orderBy("user_id", "session_idx")


def q_events_asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF attribution: every purchase matched to the user's latest
    click at-or-before it (union-tag window plan — one shuffle, no
    inequality join); DuckDB replays it with its native ASOF JOIN."""
    from motive_spark.datapipe import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    out = asof_join(
        purchases, clicks, key="user_id", right_cols=["click_event_id"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.col("asof_click_event_id").alias("click_event_id"),
        "asof_lag_us",
    ).orderBy("event_id")


def q_events_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming tumbling-window event counts drained
    exactly-once (availableNow + foreachBatch parquet) — second
    streaming contract row; DuckDB replays it as a date_trunc GROUP
    BY."""
    from motive_spark.streaming import stream_windowed_event_counts

    return stream_windowed_event_counts(
        spark, f"{sf_dir}/events.parquet", window="1 hour"
    ).orderBy("window_start")


def q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract the JSON prop k from the
    props string column, bucket stats per k."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .orderBy("k")
    )


TGRAPH_ITEM_CAP = 40


def q_events_temporal_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal link graph: the per-DAY user↔item interaction graph
    (item = JSON prop k) with per-window structural metrics plus the
    item-degree-capped co-interaction projection edge count — the
    window start is an ordinary partition column, so a year of
    snapshots fans out with no per-window loop."""
    from motive_spark.graph import (
        windowed_copair_count,
        windowed_edges,
        windowed_graph_metrics,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wedges = windowed_edges(
        ev,
        "ts",
        F.col("user_id").cast("long"),
        F.get_json_object("props", "$.k").cast("long"),
        "1 day",
    )
    metrics = windowed_graph_metrics(wedges)
    copairs = windowed_copair_count(wedges, item_cap=TGRAPH_ITEM_CAP)
    return (
        metrics.join(copairs, "win_start", "left")
        .select(
            "win_start",
            "n_edges",
            F.col("n_src").alias("n_users"),
            F.col("n_dst").alias("n_items"),
            F.col("max_src_deg").alias("max_user_deg"),
            F.coalesce("n_copairs", F.lit(0)).alias("n_copairs"),
        )
        .orderBy("win_start")
    )


_TEMPORAL_GRAPH_SQL = f"""
WITH we AS MATERIALIZED (
  SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS win_start,
         CAST(user_id AS BIGINT) AS src,
         CAST(props->>'$.k' AS BIGINT) AS dst
  FROM events
  WHERE user_id IS NOT NULL AND (props->>'$.k') IS NOT NULL
),
deg AS (SELECT win_start, src, COUNT(*) AS d FROM we GROUP BY 1, 2),
base AS (
  SELECT win_start, COUNT(*) AS n_edges,
         COUNT(DISTINCT src) AS n_users, COUNT(DISTINCT dst) AS n_items
  FROM we GROUP BY 1
),
mx AS (SELECT win_start, MAX(d) AS max_user_deg FROM deg GROUP BY 1),
kept AS MATERIALIZED (
  SELECT we.* FROM we
  JOIN (SELECT win_start, dst, COUNT(*) AS ic FROM we GROUP BY 1, 2
        HAVING COUNT(*) <= {TGRAPH_ITEM_CAP}) s
    USING (win_start, dst)
),
cop AS (
  SELECT win_start, COUNT(*) AS n_copairs FROM (
    SELECT DISTINCT a.win_start, a.src AS u1, b.src AS u2
    FROM kept a JOIN kept b
      ON a.win_start = b.win_start AND a.dst = b.dst AND a.src < b.src
  ) GROUP BY 1
)
SELECT base.win_start,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_items AS BIGINT) AS n_items,
       CAST(max_user_deg AS BIGINT) AS max_user_deg,
       CAST(COALESCE(cop.n_copairs, 0) AS BIGINT) AS n_copairs
FROM base
JOIN mx USING (win_start)
LEFT JOIN cop USING (win_start)
ORDER BY win_start"""


def q_events_windowed_components(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-day connected components of the user↔item interaction
    snapshots, all 30 days solved in ONE hash-min kernel run via
    composite (day, vertex) ids — per-snapshot fragmentation summary."""
    from motive_spark.graph import windowed_components, windowed_edges

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wedges = windowed_edges(
        ev,
        "ts",
        F.col("user_id").cast("long"),
        F.get_json_object("props", "$.k").cast("long"),
        "1 day",
    )
    return windowed_components(wedges).orderBy("win_start")


_WINDOWED_COMPONENTS_SQL = """
WITH RECURSIVE we AS MATERIALIZED (
  SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS w,
         CAST(user_id AS BIGINT) AS src,
         CAST(props->>'$.k' AS BIGINT) + 2147483648 AS dst
  FROM events
  WHERE user_id IS NOT NULL AND (props->>'$.k') IS NOT NULL
),
wsym AS MATERIALIZED (
  SELECT w, src, dst FROM we
  UNION ALL SELECT w, dst AS src, src AS dst FROM we
),
reach(w, id, m) AS (
  SELECT w, src AS id, src AS m FROM wsym
  UNION
  SELECT s.w, s.dst AS id, r.m
  FROM wsym s JOIN reach r ON s.w = r.w AND s.src = r.id
),
comp AS (SELECT w, id, MIN(m) AS c FROM reach GROUP BY 1, 2),
sizes AS (SELECT w, c, COUNT(*) AS sz FROM comp GROUP BY 1, 2)
SELECT w AS win_start,
       CAST(SUM(sz) AS BIGINT) AS n_vertices,
       COUNT(*) AS n_components,
       CAST(MAX(sz) AS BIGINT) AS max_component
FROM sizes GROUP BY 1 ORDER BY 1"""


WPR_ITERS = 5
WPR_DAMPING = 0.85
WPR_ITEM_OFFSET = 1 << 31


def q_events_windowed_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temporal PageRank: an independent PageRank for EVERY daily
    interaction snapshot, all 30 converging together in one grouped
    iteration loop (per-window vertex counts, dangling mass and
    teleport) — the temporal twin of the flagship kernel."""
    from motive_spark.graph import windowed_edges
    from motive_spark.kernels import grouped_pagerank

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wedges = windowed_edges(
        ev,
        "ts",
        F.col("user_id").cast("long"),
        F.get_json_object("props", "$.k").cast("long")
        + F.lit(WPR_ITEM_OFFSET),
        "1 day",
    ).withColumnRenamed("win_start", "g")
    pr = grouped_pagerank(
        wedges, "g", damping=WPR_DAMPING, max_iter=WPR_ITERS
    )
    return pr.select(
        F.col("g").alias("win_start"),
        "id",
        F.round("rank", 6).alias("rank"),
    ).orderBy("win_start", "id")


def _windowed_pagerank_sql(
    iters: int = WPR_ITERS, d: float = WPR_DAMPING
) -> str:
    parts = [
        f"""WITH we AS MATERIALIZED (
  SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS w,
         CAST(user_id AS BIGINT) AS src,
         CAST(props->>'$.k' AS BIGINT) + {WPR_ITEM_OFFSET} AS dst
  FROM events
  WHERE user_id IS NOT NULL AND (props->>'$.k') IS NOT NULL
),
verts AS (
  SELECT DISTINCT w, id FROM (
    SELECT w, src AS id FROM we UNION ALL SELECT w, dst AS id FROM we
  )
),
od AS (SELECT w, src AS id, COUNT(*) AS od FROM we GROUP BY 1, 2),
base AS MATERIALIZED (
  SELECT v.w, v.id, COALESCE(od.od, 0) AS od
  FROM verts v LEFT JOIN od ON od.w = v.w AND od.id = v.id
),
ng AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS DOUBLE) AS n FROM base GROUP BY 1
),
r0 AS MATERIALIZED (
  SELECT b.w, b.id, b.od, 1.0::DOUBLE / ng.n AS rank
  FROM base b JOIN ng USING (w)
)"""
    ]
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        parts.append(
            f""",
c{i} AS MATERIALIZED (
  SELECT e.w, e.dst AS id, SUM(r.rank / r.od) AS recv
  FROM we e JOIN {p} r ON r.w = e.w AND r.id = e.src AND r.od > 0
  GROUP BY 1, 2
),
dg{i} AS (
  SELECT w, COALESCE(SUM(rank), 0.0::DOUBLE) AS dang
  FROM {p} WHERE od = 0 GROUP BY 1
),
r{i} AS MATERIALIZED (
  SELECT b.w, b.id, b.od,
         (1.0::DOUBLE - {d}) / ng.n
         + {d} * COALESCE(c.recv, 0.0::DOUBLE)
         + {d} * COALESCE(dg.dang, 0.0::DOUBLE) / ng.n AS rank
  FROM base b
  JOIN ng USING (w)
  LEFT JOIN c{i} c ON c.w = b.w AND c.id = b.id
  LEFT JOIN dg{i} dg ON dg.w = b.w
)"""
        )
    parts.append(
        f"""
SELECT w AS win_start, id, ROUND(rank, 6) AS rank
FROM r{iters} ORDER BY win_start, id"""
    )
    return "".join(parts)


CODE_N_REPOS = 64
CODE_IMPORTS = 3


def _hex8(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _code_table_from_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An oracle-replayable code table (repo, path, commit, lang,
    content) derived from documents via md5 arithmetic: doc i belongs
    to repo ``i % 64``, gets an md5-chosen language, and its content
    embeds 3 md5-chosen cross-repo import lines in that language's
    real syntax, followed by the document text as filler.  The
    north-rule input shape, reconstructible in DuckDB (the in-library
    ``tables.synth_code_table`` uses Spark-only xxhash64, so the
    contract derives its own)."""
    from motive_spark.tables import _IMPORT_TPL, LANGS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    did = F.col("doc_id").cast("string")
    rid = F.pmod("doc_id", F.lit(CODE_N_REPOS))
    lidx = F.pmod(_hex8(F.concat(did, F.lit("|lang"))), F.lit(len(LANGS)))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (lidx + 1).cast("int")
    )
    lines = []
    for j in range(CODE_IMPORTS):
        t = F.pmod(
            _hex8(F.concat(did, F.lit(f"|imp{j}"))),
            F.lit(CODE_N_REPOS - 1),
        )
        tf = F.when(t >= rid, t + 1).otherwise(t)
        mod = F.concat(F.lit("repo_"), tf.cast("string"))
        per_lang = F.create_map(
            *[
                x
                for l_ in LANGS
                for x in (
                    F.lit(l_),
                    F.concat(
                        F.lit(_IMPORT_TPL[l_].split("{mod}")[0]),
                        mod,
                        F.lit(_IMPORT_TPL[l_].split("{mod}")[1]),
                    ),
                )
            ]
        )
        lines.append(per_lang[lang])
    content = F.concat_ws("\n", *lines, F.col("text"))
    return docs.select(
        F.concat(F.lit("repo_"), rid.cast("string")).alias("repo"),
        did.alias("path"),
        F.sha2(did, 256).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def q_code_dependency_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-rule flagship pipeline end-to-end: code table →
    Arrow-UDF import extraction → module→repo resolution →
    (src_repo, dst_repo, n_files) edges.  The oracle derives the SAME
    expected edges from the md5 generative formula, so the regex
    extraction + template rendering + resolution + aggregation are all
    hard-gated (a parse miss is a hash mismatch)."""
    from motive_spark.extract import repo_edges

    code = _code_table_from_docs(spark, sf_dir)
    return repo_edges(code).orderBy("src_repo", "dst_repo")


_CODE_EDGES_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, doc_id % {CODE_N_REPOS} AS rid FROM documents
),
tgts AS (
  SELECT doc_id, rid,
         CASE WHEN t >= rid THEN t + 1 ELSE t END AS tgt
  FROM (
    SELECT b.doc_id, b.rid, js.j,
           (('0x' || substr(md5(CAST(b.doc_id AS VARCHAR) || '|imp'
                                || js.j), 1, 8))::BIGINT)
             % {CODE_N_REPOS - 1} AS t
    FROM base b, (VALUES (0), (1), (2)) AS js(j)
  )
),
resolved AS (SELECT DISTINCT doc_id, rid, tgt FROM tgts)
SELECT 'repo_' || CAST(rid AS VARCHAR) AS src_repo,
       'repo_' || CAST(tgt AS VARCHAR) AS dst_repo,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_files
FROM resolved GROUP BY 1, 2 ORDER BY 1, 2"""


def q_code_sha_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The input_hint's per-row invariant, hard-gated: sha256(content)
    of every generated file must match DuckDB's sha256 over the
    byte-identical reconstructed content — reported as per-repo
    (n_files, min sha)."""
    from motive_spark.extract import with_sha

    code = with_sha(_code_table_from_docs(spark, sf_dir))
    return (
        code.groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.min("content_sha256").alias("min_sha"),
        )
        .orderBy("repo")
    )


_CODE_SHA_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, text, doc_id % {CODE_N_REPOS} AS rid,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|lang'), 1, 8))
          ::BIGINT) % 5 AS lidx
  FROM documents
),
tl AS (
  SELECT *,
    CASE WHEN t0 >= rid THEN t0 + 1 ELSE t0 END AS g0,
    CASE WHEN t1 >= rid THEN t1 + 1 ELSE t1 END AS g1,
    CASE WHEN t2 >= rid THEN t2 + 1 ELSE t2 END AS g2
  FROM (
    SELECT *,
      (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|imp0'), 1, 8))
       ::BIGINT) % {CODE_N_REPOS - 1} AS t0,
      (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|imp1'), 1, 8))
       ::BIGINT) % {CODE_N_REPOS - 1} AS t1,
      (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|imp2'), 1, 8))
       ::BIGINT) % {CODE_N_REPOS - 1} AS t2
    FROM base
  )
),
rendered AS (
  SELECT rid, doc_id,
    CASE lidx
      WHEN 0 THEN 'import repo_' || g0 || chr(10) || 'import repo_' || g1
                  || chr(10) || 'import repo_' || g2
      WHEN 1 THEN 'import repo_' || g0 || '.core.Api;' || chr(10)
                  || 'import repo_' || g1 || '.core.Api;' || chr(10)
                  || 'import repo_' || g2 || '.core.Api;'
      WHEN 2 THEN chr(9) || '"repo_' || g0 || '/pkg"' || chr(10)
                  || chr(9) || '"repo_' || g1 || '/pkg"' || chr(10)
                  || chr(9) || '"repo_' || g2 || '/pkg"'
      WHEN 3 THEN 'use repo_' || g0 || '::prelude::*;' || chr(10)
                  || 'use repo_' || g1 || '::prelude::*;' || chr(10)
                  || 'use repo_' || g2 || '::prelude::*;'
      ELSE '#include <repo_' || g0 || '/api.h>' || chr(10)
           || '#include <repo_' || g1 || '/api.h>' || chr(10)
           || '#include <repo_' || g2 || '/api.h>'
    END || chr(10) || text AS content
  FROM tl
)
SELECT 'repo_' || CAST(rid AS VARCHAR) AS repo,
       COUNT(*) AS n_files,
       MIN(sha256(content)) AS min_sha
FROM rendered GROUP BY 1 ORDER BY 1"""


_DATAPIPE_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "code_dependency_edges": q_code_dependency_edges,
    "code_sha_invariant": q_code_sha_invariant,
    "events_temporal_graph": q_events_temporal_graph,
    "events_windowed_components": q_events_windowed_components,
    "events_windowed_pagerank": q_events_windowed_pagerank,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_incremental": q_dedup_incremental,
    "dedup_clusters": q_dedup_clusters,
    "dedup_multi_signal": q_dedup_multi_signal,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "text_token_stats": q_text_token_stats,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "text_gopher": q_text_gopher,
    "knn_cosine_topk": q_knn_cosine_topk,
    "knn_lsh_topk": q_knn_lsh_topk,
    "knn_ivf_topk": q_knn_ivf_topk,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "multimodal_features": q_multimodal_features,
    "motif_triad_census": q_motif_triad_census,
    "motif_k3_er_factors": q_motif_k3_er_factors,
    "motif_planted_factors": q_motif_planted_factors,
    "stream_dedup": q_stream_dedup,
    "stream_late_data": q_stream_late_data,
    "stream_stream_join": q_stream_stream_join,
    "stream_enrich": q_stream_enrich,
    "events_sessionize": q_events_sessionize,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_rolling_stats": q_events_rolling,
    "events_approx_distinct": q_events_approx_distinct,
    "emb_random_projection": q_emb_random_projection,
    "events_asof_clicks": q_events_asof_clicks,
    "events_windowed_counts": q_events_windowed_counts,
    "events_props_json": q_events_props_json,
    "kmeans_embeddings": q_kmeans_embeddings,
    "text_bm25": q_text_bm25,
    "text_tfidf_similar": q_text_tfidf_similar,
    "text_collocations": q_text_collocations,
    "text_heavy_hitters": q_text_heavy_hitters,
    "docs_kmv_distinct": q_docs_kmv_distinct,
    "docs_kmv_setops": q_docs_kmv_setops,
    "orders_assoc_rules": q_orders_assoc_rules,
    "events_scd2": q_events_scd2,
    "events_transitions": q_events_transitions,
    "orders_salted_join": q_orders_salted_join,
    "lineitem_hot_keys": q_lineitem_hot_keys,
    "orders_bloom_prune": q_orders_bloom_prune,
    "text_contamination": q_text_contamination,
    "text_redact_pii": q_text_redact_pii,
    "docs_stratified_sample": q_docs_stratified_sample,
    "docs_weighted_sample": q_docs_weighted_sample,
    "part_record_linkage": q_part_record_linkage,
    "orders_percentiles": q_orders_percentiles,
    "lineitem_approx_percentiles": q_lineitem_approx_percentiles,
}



# full-pipeline MDL golden: six-term naive-contraction codelength of the
# planted tri-hub fixture, derived in SQL from scratch (triangle
# enumeration -> contraction -> KT/lgamma code arithmetic)
SQL_PLANTED_FACTORS = """
WITH fixture(src, dst) AS (VALUES
  (0,1),(1,2),(2,0),(3,4),(4,5),(5,3),(6,7),(7,8),(8,6),
  (9,10),(10,11),(11,9),(12,0),(12,3),(12,6),(12,9)),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM fixture WHERE src != dst),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM und UNION ALL SELECT dst FROM und)),
nm AS (SELECT (SELECT COUNT(*) FROM verts) AS n, (SELECT COUNT(*) FROM und) AS m),
tri AS (
  SELECT a.src AS x, a.dst AS y, b.dst AS z
  FROM und a JOIN und b ON b.src = a.src AND b.dst > a.dst
  JOIN und c ON c.src = a.dst AND c.dst = b.dst),
occ AS MATERIALIZED (SELECT ROW_NUMBER() OVER (ORDER BY x, y, z) AS occ_id, x, y, z FROM tri),
member AS MATERIALIZED (
  SELECT occ_id, x AS v, 0 AS pos, x AS rep FROM occ
  UNION ALL SELECT occ_id, y, 1, x FROM occ
  UNION ALL SELECT occ_id, z, 2, x FROM occ),
mapped AS (
  SELECT ms.occ_id AS occ_s, ms.pos AS pos_s, COALESCE(ms.rep, e.src) AS ns,
         md.occ_id AS occ_d, md.pos AS pos_d, COALESCE(md.rep, e.dst) AS nd
  FROM und e
  LEFT JOIN member ms ON ms.v = e.src
  LEFT JOIN member md ON md.v = e.dst),
surviving AS MATERIALIZED (
  SELECT LEAST(ns, nd) AS a, GREATEST(ns, nd) AS b, occ_s, pos_s, occ_d, pos_d
  FROM mapped
  WHERE occ_s IS NULL OR occ_d IS NULL OR occ_s != occ_d),
pair_mult AS MATERIALIZED (SELECT a, b, COUNT(*) AS pm FROM surviving GROUP BY a, b),
-- wiring bits: KT closed form per occurrence, alphabet k=3, alpha=0.5
wiring AS (
  SELECT occ_s AS occ_id, pos_s AS pos FROM surviving WHERE occ_s IS NOT NULL
  UNION ALL
  SELECT occ_d, pos_d FROM surviving WHERE occ_d IS NOT NULL),
wb_occ AS (
  SELECT occ_id,
         (lgamma(SUM(c) + 1.5) - lgamma(1.5)) / ln(2)
         - SUM((lgamma(c + 0.5) - lgamma(0.5)) / ln(2)) AS bits
  FROM (SELECT occ_id, pos, COUNT(*) AS c FROM wiring GROUP BY occ_id, pos)
  GROUP BY occ_id),
wiring_bits AS (SELECT COALESCE(SUM(bits), 0) AS v FROM wb_occ),
-- multi-edge additions: pm-1 for contracted pairs incident to a rep
additions AS (
  SELECT pm - 1 AS val FROM pair_mult p
  WHERE p.a IN (SELECT DISTINCT rep FROM member)
     OR p.b IN (SELECT DISTINCT rep FROM member)),
add_stats AS (SELECT COUNT(*) AS nv, MAX(val) AS mx FROM additions),
add_grp AS (SELECT val, COUNT(*) AS c FROM additions GROUP BY val),
multi_bits AS (
  SELECT CASE WHEN (SELECT nv FROM add_stats) = 0 THEN 1.0
    ELSE (2 * floor(log2((SELECT mx FROM add_stats) + 1.0)) + 1)
      + (lgamma((SELECT nv FROM add_stats) + 0.5 * ((SELECT mx FROM add_stats) + 1))
         - lgamma(0.5 * ((SELECT mx FROM add_stats) + 1))) / ln(2)
      - (SELECT SUM((lgamma(c + 0.5) - lgamma(0.5)) / ln(2)) FROM add_grp)
  END AS v),
counts0 AS (
  SELECT (SELECT COUNT(*) FROM occ) AS n_occ,
         (SELECT n FROM nm) - 2 * (SELECT COUNT(*) FROM occ) AS n_sub,
         (SELECT COUNT(*) FROM pair_mult) AS m_sub,
         (SELECT n FROM nm) AS n, (SELECT m FROM nm) AS m),
labels_ins AS (
  SELECT (2 * floor(log2(n_occ + 1.0)) + 1)
         + (lgamma(n_sub + 1.0) - lgamma(n_occ + 1.0) - lgamma(n_sub - n_occ + 1.0)) / ln(2) AS labels,
         (lgamma(n + 1.0) - lgamma(n_sub + 1.0)) / ln(2) AS insertions
  FROM counts0),
-- subbed degree histogram over the n_sub surviving vertices
subv AS (
  SELECT v FROM verts WHERE v NOT IN (SELECT v FROM member WHERE v != rep)),
subdeg AS (
  SELECT sv.v, COALESCE(d.deg, 0) AS deg
  FROM subv sv LEFT JOIN (
    SELECT v, COUNT(*) AS deg
    FROM (SELECT a AS v FROM pair_mult UNION ALL SELECT b FROM pair_mult)
    GROUP BY v) d ON d.v = sv.v),
subhist AS (SELECT deg, COUNT(*) AS c FROM subdeg GROUP BY deg),
basedeg AS (
  SELECT vv.v, COALESCE(d.deg, 0) AS deg
  FROM verts vv LEFT JOIN (
    SELECT v, COUNT(*) AS deg
    FROM (SELECT src AS v FROM und UNION ALL SELECT dst FROM und)
    GROUP BY v) d ON d.v = vv.v),
basehist AS (SELECT deg, COUNT(*) AS c FROM basedeg GROUP BY deg),
motifhist(deg, c) AS (VALUES (2, 3)),  -- triangle: all three vertices degree 2
-- EL codelength, undirected: prefix(maxdeg) + n*H(hist) + lg((2m)!) - sum c*lg(d!) - lg(m!) - m
el_sub AS (
  SELECT (2 * floor(log2(MAX(deg) + 1.0)) + 1)
         - SUM(c * log2(c / CAST((SELECT n_sub FROM counts0) AS DOUBLE)))
         + (lgamma(2.0 * (SELECT m_sub FROM counts0) + 1) - lgamma((SELECT m_sub FROM counts0) + 1.0)) / ln(2)
         - SUM(c * lgamma(deg + 1.0) / ln(2))
         - (SELECT m_sub FROM counts0) AS v
  FROM subhist),
el_base AS (
  SELECT (2 * floor(log2(MAX(deg) + 1.0)) + 1)
         - SUM(c * log2(c / CAST((SELECT n FROM counts0) AS DOUBLE)))
         + (lgamma(2.0 * (SELECT m FROM counts0) + 1) - lgamma((SELECT m FROM counts0) + 1.0)) / ln(2)
         - SUM(c * lgamma(deg + 1.0) / ln(2))
         - (SELECT m FROM counts0) AS v
  FROM basehist),
el_motif AS (
  SELECT (2 * floor(log2(MAX(deg) + 1.0)) + 1)
         - SUM(c * log2(c / 3.0))
         + (lgamma(2.0 * 3 + 1) - lgamma(3 + 1.0)) / ln(2)
         - SUM(c * lgamma(deg + 1.0) / ln(2))
         - 3 AS v
  FROM motifhist),
-- ER codelength: log2 C(maxlinks, m) + prefix(n) + log2(maxlinks + 1)
er_sub AS (
  SELECT (lgamma(n_sub * (n_sub - 1) / 2.0 + 1) - lgamma(m_sub + 1.0)
          - lgamma(n_sub * (n_sub - 1) / 2.0 - m_sub + 1)) / ln(2)
         + (2 * floor(log2(n_sub + 1.0)) + 1) + log2(n_sub * (n_sub - 1) / 2.0 + 1) AS v
  FROM counts0),
er_base AS (
  SELECT (lgamma(n * (n - 1) / 2.0 + 1) - lgamma(m + 1.0)
          - lgamma(n * (n - 1) / 2.0 - m + 1)) / ln(2)
         + (2 * floor(log2(n + 1.0)) + 1) + log2(n * (n - 1) / 2.0 + 1) AS v
  FROM counts0),
er_motif AS (
  SELECT (lgamma(3 * 2 / 2.0 + 1) - lgamma(3 + 1.0) - lgamma(3 * 2 / 2.0 - 3 + 1)) / ln(2)
         + (2 * floor(log2(3 + 1.0)) + 1) + log2(3 * 2 / 2.0 + 1) AS v),
common AS (
  SELECT (SELECT v FROM wiring_bits) + (SELECT v FROM multi_bits)
         + (SELECT labels FROM labels_ins) + (SELECT insertions FROM labels_ins) AS v)
SELECT 'triangle' AS motif, 3 AS k, (SELECT n_occ FROM counts0) AS n_occ,
  ROUND((SELECT v FROM er_motif) + (SELECT v FROM er_sub) + (SELECT v FROM common), 6) AS size_er,
  ROUND((SELECT v FROM el_motif) + (SELECT v FROM el_sub) + (SELECT v FROM common), 6) AS size_el,
  ROUND((SELECT v FROM er_base) - ((SELECT v FROM er_motif) + (SELECT v FROM er_sub) + (SELECT v FROM common)), 6) AS factor_er,
  ROUND((SELECT v FROM el_base) - ((SELECT v FROM el_motif) + (SELECT v FROM el_sub) + (SELECT v FROM common)), 6) AS factor_el"""

_DATAPIPE_ORACLES = {
    "dedup_exact": """
SELECT md5(text) AS text_md5, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
FROM documents GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1""",
    "dedup_ngram_jaccard": _jaccard_sql(),
    "dedup_incremental": _incremental_dedup_sql(),
    "dedup_clusters": _dedup_clusters_sql(),
    "dedup_multi_signal": _multi_signal_sql(),
    "text_gopher": _gopher_sql(),

    # byte-exact featurizer contract: blob bytes recovered from hex()
    # digit pairs (strpos over '123456789ABCDEF' maps '0'->0 .. 'F'->15),
    # binned >>3, compared as integer counts + a (bin+1)-weighted
    # checksum over all 32 bins — no float crosses the engine boundary
    "multimodal_features": """
WITH pay AS MATERIALIZED (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
bytes AS (
  SELECT doc_id,
         (strpos('123456789ABCDEF', substr(hx, 2*i+1, 1)) * 16
          + strpos('123456789ABCDEF', substr(hx, 2*i+2, 1))) // 8 AS bin
  FROM pay, UNNEST(range(n)) AS t(i)
),
counts AS (
  SELECT doc_id, bin, COUNT(*) AS c FROM bytes GROUP BY doc_id, bin
)
SELECT p.doc_id, CAST(p.n AS BIGINT) AS n_bytes,
  CAST(COALESCE(SUM(CASE WHEN bin = 4 THEN c END), 0) AS BIGINT) AS c_bin4,
  CAST(COALESCE(SUM(CASE WHEN bin = 12 THEN c END), 0) AS BIGINT) AS c_bin12,
  CAST(COALESCE(SUM(CASE WHEN bin = 13 THEN c END), 0) AS BIGINT) AS c_bin13,
  CAST(COALESCE(SUM(CASE WHEN bin = 14 THEN c END), 0) AS BIGINT) AS c_bin14,
  CAST(COALESCE(SUM((bin + 1) * c), 0) AS BIGINT) AS wsum
FROM pay p LEFT JOIN counts USING (doc_id)
GROUP BY p.doc_id, p.n ORDER BY p.doc_id""",
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_simhash": _simhash_sql(),
    # streaming drain == batch GROUP BY: same key, same aggregates
    "stream_late_data": _STREAM_LATE_SQL,
    "stream_stream_join": _STREAM_STREAM_SQL,
    "stream_dedup": """
SELECT md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS content_key,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1 ORDER BY 1""",
    # stream-static join drain == batch JOIN + GROUP BY
    "stream_enrich": """
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents,
       MIN(e.event_id) AS first_event_id
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_funnel": _funnel_sql(),
    "events_retention": _retention_sql(),
    "events_rolling_stats": _rolling_sql(),
    "events_approx_distinct": _approx_distinct_sql(),
    "emb_random_projection": _random_projection_sql(),
    "events_sessionize": """
WITH x AS (
  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
),
y AS (
  SELECT *, CASE WHEN prev IS NULL OR us - prev > 1800000000
                 THEN 1 ELSE 0 END AS brk
  FROM x
),
z AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_idx
  FROM y
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       CAST((MAX(us) - MIN(us)) // 1000000 AS BIGINT) AS duration_seconds,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM z GROUP BY user_id, session_idx ORDER BY user_id, session_idx""",
    # the engine's union-tag window AS-OF == DuckDB's native ASOF JOIN
    "events_asof_clicks": """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, MAX(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       c.click_event_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS asof_lag_us
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id""",
    "events_windowed_counts": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR,
                '%Y-%m-%d %H:%M:%S') AS window_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events GROUP BY 1, 2 ORDER BY 1""",
    "code_dependency_edges": _CODE_EDGES_SQL,
    "code_sha_invariant": _CODE_SHA_SQL,
    "events_temporal_graph": _TEMPORAL_GRAPH_SQL,
    "events_windowed_components": _WINDOWED_COMPONENTS_SQL,
    "events_windowed_pagerank": _windowed_pagerank_sql(),
    "events_props_json": """
SELECT CAST(props->>'$.k' AS BIGINT) AS k,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events GROUP BY 1 ORDER BY 1""",
    "kmeans_embeddings": _kmeans_sql(),
    "text_bm25": _bm25_sql(),
    "text_tfidf_similar": _tfidf_similar_sql(max_df_frac=0.8),
    "text_collocations": _collocations_sql(),
    "text_contamination": _contamination_sql(),
    "text_redact_pii": _redact_pii_sql(),
    "docs_stratified_sample": _stratified_sample_sql(),
    "docs_weighted_sample": _weighted_sample_sql(),
    "text_heavy_hitters": _heavy_hitters_sql(),
    "docs_kmv_distinct": _kmv_distinct_sql(),
    "docs_kmv_setops": _kmv_setops_sql(),
    "orders_assoc_rules": _ASSOC_SQL,
    "events_scd2": _SCD2_SQL,
    "events_transitions": _TRANSITIONS_SQL,
    "orders_salted_join": _SALTED_JOIN_SQL,
    "lineitem_hot_keys": _HOT_KEYS_SQL,
    "orders_bloom_prune": _bloom_prune_sql(),
    "part_record_linkage": _LINKAGE_SQL,
    # exact histogram percentiles: smallest value whose cumulative count
    # reaches ceil(p * n), integer arithmetic throughout
    "orders_percentiles": """
WITH h AS (
  SELECT o_orderpriority AS g, CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         COUNT(*) AS c
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT g, v,
         SUM(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY g) AS n
  FROM h
)
SELECT g AS o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       MIN(CASE WHEN cum >= (1 * n + 3) // 4 THEN v END) AS p25,
       MIN(CASE WHEN cum >= (1 * n + 1) // 2 THEN v END) AS p50,
       MIN(CASE WHEN cum >= (19 * n + 19) // 20 THEN v END) AS p95
FROM cum GROUP BY g ORDER BY g""",
    "lineitem_approx_percentiles": _approx_percentiles_sql(),
    "text_token_stats": """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) AS n_chars,
       ROUND(length(text) * 1.0 / len(string_split(text, ' ')), 6) AS avg_token_len,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
FROM documents ORDER BY doc_id""",
    "text_quality": f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS ttr,
         ({_count_token_sql('the')} + {_count_token_sql('a')}) * 1.0
           / len(string_split(text, ' ')) AS stop_ratio
  FROM documents
)
SELECT doc_id, n_tok AS n_tokens,
       ROUND(ttr, 6) AS type_token_ratio,
       ROUND(stop_ratio, 6) AS stopword_ratio,
       ROUND(0.4 * (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
             + 0.3 * LEAST(stop_ratio * 10.0, 1.0) + 0.3 * ttr, 6) AS quality
FROM t ORDER BY doc_id""",
    "text_langid": _langid_sql(),
    "text_fingerprint": (
        "WITH "
        + _GRAM_SQL.replace("FROM documents", "FROM documents WHERE len(string_split(text,' ')) >= 5")
        + ","
        + _grams_sql(5)
        + """,
hashed AS (SELECT doc_id, md5(gram) AS h FROM grams),
ranked AS (
  SELECT doc_id, h, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h) AS rank
  FROM hashed
)
SELECT doc_id, h, rank FROM ranked WHERE rank <= 4 ORDER BY doc_id, rank"""
    ),
    "knn_cosine_topk": """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS va FROM embeddings WHERE vec_id < 10),
b AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS vb FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(list_cosine_similarity(va, vb), 6) AS cos
  FROM q CROSS JOIN b WHERE query_id != neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 5
ORDER BY query_id, rank""",
    "knn_lsh_topk": _lsh_sql(),
    "knn_ivf_topk": """
WITH emb AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS MATERIALIZED (
  SELECT vec_id AS cid, v AS cvec FROM emb
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
assign0 AS MATERIALIZED (
  SELECT e.vec_id, c.cid,
         ROUND(list_cosine_similarity(e.v, c.cvec), 6) AS ccos
  FROM emb e CROSS JOIN cents c),
assign AS MATERIALIZED (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid ASC) AS rn
    FROM assign0) WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY ccos DESC, cid ASC) AS rn
    FROM assign0 WHERE vec_id < 10) WHERE rn <= 4),
cands AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a USING (cid)
  WHERE a.vec_id != p.query_id),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(list_cosine_similarity(q.v, n.v), 6) AS cos
  FROM cands
  JOIN emb q ON q.vec_id = query_id
  JOIN emb n ON n.vec_id = neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 5
ORDER BY query_id, rank""",

    "dedup_embedding_cosine": """
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM emb a CROSS JOIN emb b
WHERE a.vec_id < b.vec_id
  AND ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4
ORDER BY vec_a, vec_b""",
    "motif_triad_census": (
        "WITH "
        + SQL_GRAPH
        + """,
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
tri AS (
  SELECT COUNT(*) AS t FROM und a
  JOIN und b ON a.src = b.src AND a.dst < b.dst
  JOIN und c ON c.src = a.dst AND c.dst = b.dst
),
w AS (SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS w FROM deg)
SELECT 'path' AS motif, (SELECT w FROM w) - 3 * (SELECT t FROM tri) AS n
UNION ALL
SELECT 'triangle' AS motif, (SELECT t FROM tri) AS n
ORDER BY motif"""
    ),
    "motif_planted_factors": SQL_PLANTED_FACTORS,
    "motif_k3_er_factors": (
        "WITH "
        + SQL_GRAPH
        + """,
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
tri AS (
  SELECT COUNT(*) AS t FROM und a
  JOIN und b ON a.src = b.src AND a.dst < b.dst
  JOIN und c ON c.src = a.dst AND c.dst = b.dst
),
w AS (SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS w FROM deg),
nm AS (SELECT (SELECT COUNT(*) FROM verts) AS n, (SELECT COUNT(*) FROM und) AS m),
census AS (
  SELECT 'path' AS motif, 2.0 AS m_motif,
         CAST((SELECT w FROM w) - 3 * (SELECT t FROM tri) AS BIGINT) AS n_occ
  UNION ALL
  SELECT 'triangle', 3.0, CAST((SELECT t FROM tri) AS BIGINT)
)
SELECT motif, n_occ,
  ROUND(5 + LOG2(4) +
        (lgamma(4.0) - lgamma(m_motif + 1) - lgamma(4.0 - m_motif)) / LN(2),
        4) AS sub_er,
  ROUND(2 * FLOOR(LOG2(n_occ + 1.0)) + 1 +
        (lgamma(n + 1.0) - lgamma(LEAST(n_occ, n // 3) + 1.0)
         - lgamma(n - LEAST(n_occ, n // 3) + 1.0)) / LN(2),
        4) AS labels_bits,
  ROUND(2 * FLOOR(LOG2(n + 1.0)) + 1 + LOG2(n * (n - 1.0) / 2 + 1) +
        (lgamma(n * (n - 1.0) / 2 + 1) - lgamma(m + 1.0)
         - lgamma(n * (n - 1.0) / 2 - m + 1.0)) / LN(2),
        4) AS er_baseline
FROM census, nm
ORDER BY motif"""
    ),
}


# ---------------------------------------------------------------------------
# relational / window coverage over events + orders
# ---------------------------------------------------------------------------


def q_events_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer-cents sum first: float `value` has 2-decimal semantics, so
    # per-row round(value*100) is exact in every engine and the average
    # is then a deterministic double (no summation-order boundary flips)
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(cents) / (F.count(F.lit(1)) * 100.0), 6).alias("avg_value"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy("user_id")
    )


def q_events_top3_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("event_type", "rnk", "event_id", "value")
        .orderBy("event_type", "rnk")
    )


def q_lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the multi-granularity aggregation class
    beyond cube/rollup) with grouping_id disambiguating the NULL-key
    levels; integer-cents money, exact."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(qty).alias("sum_qty"),
            F.sum(cents).alias("revenue_cents"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


def q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents) / 100.0).alias("revenue"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def q_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents) / 100.0).alias("revenue"),
        )
        .orderBy("month")
    )


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1995-03-15"


def _day_ts(day: str, plus_days: int = 0):
    """Day-boundary literal as a native timestamp_ntz for PUSHABLE scan
    predicates: ``date_format(ts, 'yyyy-MM-dd') OP 'D'`` string compares
    are order-isomorphic to timestamp compares at day boundaries
    (zero-padded dates), so ``fmt(ts) >= D  <=>  ts >= D 00:00:00``,
    ``fmt(ts) < D  <=>  ts < D 00:00:00``, ``fmt(ts) <= D  <=>
    ts < (D+1) 00:00:00`` and ``fmt(ts) > D  <=>  ts >= (D+1) 00:00:00``
    — identical row sets, but the predicate reaches PushedFilters (a
    derived-expression filter cannot; guide §6).  The frozen DuckDB
    oracle keeps its strftime form — only the Spark plan changes."""
    import datetime as _dt

    d = _dt.date.fromisoformat(day) + _dt.timedelta(days=plus_days)
    return F.lit(f"{d.isoformat()} 00:00:00").cast("timestamp_ntz")


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (public spec) in exact fixed-point:
    qty/base in cents, disc_price in 1e-4 units, charge in 1e-6 units
    — every aggregate an integer BIGINT sum, the published decimal
    semantics without float drift.  Plan: one scan, one
    map-side-combinable groupBy on a 6-ish-key space; the filter and
    the 7-column projection push down to the parquet scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    tax_c = F.round(F.col("l_tax") * 100).cast("long")
    return (
        li.where(F.col("l_shipdate") < _day_ts("1998-09-02", plus_days=1))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("sum_qty_c"),
            F.sum(ep_c).alias("sum_base_c"),
            F.sum(ep_c * (100 - disc_c)).alias("sum_disc_price_c4"),
            F.sum(ep_c * (100 - disc_c) * (100 + tax_c)).alias(
                "sum_charge_c6"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS sum_disc_price_c4,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT)
         AS sum_charge_c6,
       COUNT(*) AS count_order
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m-%d') <= '1998-09-02'
GROUP BY 1, 2 ORDER BY 1, 2"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (public spec): revenue per
    unshipped order in a market segment — the canonical broadcast-dim
    ⋈ fact ⋈ fact plan.  The customer side is explicitly
    broadcast (a filtered dimension); lineitem⋈orders shuffles on the
    orderkey both sides already share.  Revenue summed in exact 1e-4
    units, top 10 by (revenue, orderkey)."""
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderdate") < _day_ts(Q3_DATE)
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") >= _day_ts(Q3_DATE, plus_days=1)
    )
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(ep_c * (100 - disc_c)).alias("revenue_c4"))
        .orderBy(F.desc("revenue_c4"), "l_orderkey")
        .limit(10)
    )


_TPCH_Q3_SQL = f"""
SELECT l.l_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_c4
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND strftime(o.o_orderdate, '%Y-%m-%d') < '{Q3_DATE}'
  AND strftime(l.l_shipdate, '%Y-%m-%d') > '{Q3_DATE}'
GROUP BY 1, 2, 3
ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10"""


Q5_REGION = "ASIA"
Q5_YEAR_LO = "1995-01-01"
Q5_YEAR_HI = "1996-01-01"


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume (public spec): revenue per
    nation where customer and supplier share the nation, one region,
    one order year.  Plan shape is the graded one: region→nation→
    supplier is a chain of broadcast dimension joins (all tiny);
    lineitem⋈orders is the only big shuffle (both sides keyed on
    orderkey); the customer join is broadcast too and the
    c_nationkey = s_nationkey predicate rides the same join.
    Revenue in exact 1e-4 fixed-point units."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet").where(
        F.col("r_name") == Q5_REGION
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= _day_ts(Q5_YEAR_LO))
        & (F.col("o_orderdate") < _day_ts(Q5_YEAR_HI))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dim = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .join(
            F.broadcast(customer),
            (orders.o_custkey == customer.c_custkey)
            & (dim.s_nationkey == customer.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(ep_c * (100 - disc_c)).alias("revenue_c4"))
        .orderBy(F.desc("revenue_c4"), "n_name")
    )


_TPCH_Q5_SQL = f"""
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_c4
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND strftime(o_orderdate, '%Y-%m-%d') >= '{Q5_YEAR_LO}'
  AND strftime(o_orderdate, '%Y-%m-%d') < '{Q5_YEAR_HI}'
GROUP BY 1 ORDER BY revenue_c4 DESC, n_name"""


Q6_DATE_LO = "1995-01-01"
Q6_DATE_HI = "1996-01-01"
Q6_DISC_LO = 5   # cents of discount (0.05)
Q6_DISC_HI = 7
Q6_QTY = 24


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change (public spec): one scan,
    every predicate pushed to the parquet reader, one global sum in
    exact 1e-4 units — the canonical filter-aggregate microbenchmark."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        li.where(
            (F.col("l_shipdate") >= _day_ts(Q6_DATE_LO))
            & (F.col("l_shipdate") < _day_ts(Q6_DATE_HI))
            & (disc_c >= Q6_DISC_LO)
            & (disc_c <= Q6_DISC_HI)
            & (F.col("l_quantity") < Q6_QTY)
        )
        .agg(
            F.sum(ep_c * disc_c).alias("revenue_c4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_TPCH_Q6_SQL = f"""
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c4,
       COUNT(*) AS n_items
FROM lineitem
WHERE strftime(l_shipdate, '%Y-%m-%d') >= '{Q6_DATE_LO}'
  AND strftime(l_shipdate, '%Y-%m-%d') < '{Q6_DATE_HI}'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND l_quantity < {Q6_QTY}"""


Q7_NATION_A = "NATION_7"
Q7_NATION_B = "NATION_17"


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping (public spec): revenue flowing between
    two nations, by supplier/customer nation pair and ship year.  The
    nation pair predicate rides the broadcast dimension joins; the
    only big shuffle is lineitem⋈orders on orderkey.  Revenue in
    exact 1e-4 fixed-point units."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sn = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cn = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    pair_ok = (
        (F.col("supp_nation") == Q7_NATION_A)
        & (F.col("cust_nation") == Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == Q7_NATION_B)
        & (F.col("cust_nation") == Q7_NATION_A)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(F.broadcast(cn), orders.o_custkey == cn.c_custkey)
        .where(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(F.sum(ep_c * (100 - disc_c)).alias("revenue_c4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_TPCH_Q7_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       substr(strftime(l_shipdate, '%Y-%m-%d'), 1, 4) AS l_year,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_c4
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE (sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
   OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""


Q10_DATE_LO = "1995-01-01"
Q10_DATE_HI = "1995-04-01"


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting (public spec): lost revenue
    per customer from returned lineitems of one order quarter, top 20.
    The returnflag filter pushes into the lineitem scan; customer and
    nation broadcast."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        (F.col("o_orderdate") >= _day_ts(Q10_DATE_LO))
        & (F.col("o_orderdate") < _day_ts(Q10_DATE_HI))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_returnflag") == "R"
    )
    ep_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    cdim = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cdim), orders.o_custkey == cdim.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal") * 100).cast("long").alias(
                "c_acctbal_c"
            ),
            "c_mktsegment",
            "n_name",
        )
        .agg(F.sum(ep_c * (100 - disc_c)).alias("revenue_c4"))
        .orderBy(F.desc("revenue_c4"), "c_custkey")
        .limit(20)
    )


_TPCH_Q10_SQL = f"""
SELECT c_custkey, c_name,
       CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal_c,
       c_mktsegment, n_name,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_c4
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND strftime(o_orderdate, '%Y-%m-%d') >= '{Q10_DATE_LO}'
  AND strftime(o_orderdate, '%Y-%m-%d') < '{Q10_DATE_HI}'
GROUP BY 1, 2, 3, 4, 5
ORDER BY revenue_c4 DESC, c_custkey LIMIT 20"""


# Standard Q18 uses 300; the synthetic tables' per-order quantity
# distribution is lighter than real TPC-H, so 250 keeps the HAVING
# selective (~1% of orders) while returning a non-trivial result.
Q18_QTY_THRESHOLD = 250


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers (public spec): orders whose
    total quantity exceeds a threshold, joined back to the customer.
    Plan: the HAVING aggregate runs FIRST on lineitem alone (map-side
    combinable groupBy on orderkey — the 100-TB-safe order: filter to
    the ~0.1% survivors before touching the joins), then survivors
    join orders (shuffle on orderkey) and broadcast-join customer.
    Quantity summed in exact integer cents."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("sum_qty_c"))
        .where(F.col("sum_qty_c") > Q18_QTY_THRESHOLD * 100)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias(
                "o_totalprice_c"
            ),
            "sum_qty_c",
        )
        .orderBy(F.desc("o_totalprice_c"), "o_orderkey")
        .limit(100)
    )


_TPCH_Q18_SQL = f"""
WITH big AS MATERIALIZED (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
           AS sum_qty_c
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT))
         > {Q18_QTY_THRESHOLD * 100}
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_c,
       sum_qty_c
FROM big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice_c DESC, o_orderkey LIMIT 100"""


_RELATIONAL_QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q7": q_tpch_q7,
    "tpch_q10": q_tpch_q10,
    "tpch_q18": q_tpch_q18,
    "events_user_stats": q_events_user_stats,
    "events_top3_per_type": q_events_top3_per_type,
    "orders_cube": q_orders_cube,
    "lineitem_grouping_sets": q_lineitem_grouping_sets,
    "orders_monthly": q_orders_monthly,
}

_RELATIONAL_ORACLES = {
    "tpch_q1": _TPCH_Q1_SQL,
    "tpch_q3": _TPCH_Q3_SQL,
    "tpch_q5": _TPCH_Q5_SQL,
    "tpch_q6": _TPCH_Q6_SQL,
    "tpch_q7": _TPCH_Q7_SQL,
    "tpch_q10": _TPCH_Q10_SQL,
    "tpch_q18": _TPCH_Q18_SQL,
    "events_user_stats": """
SELECT user_id, COUNT(*) AS n_events,
       ROUND(SUM(CAST(round(value * 100) AS BIGINT)) / (COUNT(*) * 100.0), 6) AS avg_value,
       COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id ORDER BY user_id""",
    "events_top3_per_type": """
SELECT event_type, rnk, event_id, value FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id ASC) AS rnk
  FROM events
) WHERE rnk <= 3 ORDER BY event_type, rnk""",
    "lineitem_grouping_sets": """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS gid,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag, l_linestatus""",
    "orders_cube": """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority""",
    "orders_monthly": """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders GROUP BY 1 ORDER BY 1""",
}
