"""Similarity search over the ``embeddings`` table (array<float>).

* ``brute_force_topk`` — exact cosine top-k: the correctness baseline.
  Dot product via zip_with + aggregate (JVM-side, codegen), doubles all
  the way so the DuckDB oracle (list_cosine_similarity on DOUBLE[])
  matches to 6 dp.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH buckets
  prune the candidate set before exact rescoring.  Hyperplanes are a
  seeded numpy Gaussian draw shipped as a broadcast plane table
  (deterministic given the seed); at 100 TB the bucket join replaces
  the quadratic cross join with a per-bucket blow-up bounded by bucket
  occupancy.
* ``embedding_near_duplicates`` — threshold near-dup pairs: exact
  all-pairs baseline or LSH-bucketed scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(pairs: DataFrame, a: str = "va", b: str = "vb") -> DataFrame:
    """Attach cosine(va, vb) as ``cos`` (double, left-to-right sums)."""
    return pairs.withColumn(
        "cos", _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def brute_force_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int | None = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors per query vector.

    ``embeddings``: (vec_id, embedding).  Queries default to the first
    ``n_queries`` ids (deterministic); pass None to use all (full knn).
    Returns (query_id, neighbor_id, rank, cos) — rank 1 = most similar,
    ties broken by neighbor_id; cos rounded to 6 dp BEFORE ranking so
    ranking is reproducible across engines.
    """
    from pyspark.sql import Window

    base = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), _as_double("embedding").alias("vb")
    )
    queries = embeddings.select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("va")
    )
    if n_queries is not None:
        queries = queries.where(F.col("query_id") < n_queries)
    pairs = queries.crossJoin(base).where(F.col("query_id") != F.col("neighbor_id"))
    scored = with_cosine(pairs).withColumn("cos", F.round("cos", 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _lsh_bucketed(
    embeddings: DataFrame, n_planes: int, n_tables: int, seed: int
) -> DataFrame:
    """(vec_id, v, bucket) — one row per (vector, hash table).

    The plane matrix is a seeded numpy Gaussian draw (plane directions
    uniform on the sphere → the exact sign-LSH collision law
    P(bit match) = 1 - theta/pi) shipped as a BROADCAST ``(t, p, plane)``
    table; sign bits come from one crossJoin + groupBy.  Building planes
    as per-dimension expression trees instead would put
    dim x planes x tables (~25k at dim 768) nodes into every query plan
    and stall Catalyst before a single task runs.
    """
    import numpy as np

    spark = embeddings.sparkSession
    dim = len(embeddings.select("embedding").first()[0])
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal(size=(n_tables, n_planes, dim))
    planes_df = spark.createDataFrame(
        [
            (t, p, [float(x) for x in planes[t, p]])
            for t in range(n_tables)
            for p in range(n_planes)
        ],
        "t int, p int, plane array<double>",
    )
    signs = emb.crossJoin(F.broadcast(planes_df)).select(
        "vec_id",
        "t",
        "p",
        F.when(_dot(F.col("v"), F.col("plane")) >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        .alias("bit"),
    )
    bucket_keys = (
        signs.groupBy("vec_id", "t")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "bit"))),
                    lambda s: s["bit"],
                ),
            ).alias("bits")
        )
        .select(
            "vec_id",
            F.concat(F.col("t").cast("string"), F.lit("|"), F.col("bits")).alias(
                "bucket"
            ),
        )
    )
    # cached because both sides of the candidate self-join read it; the
    # entry (|V| x n_tables skinny rows) is left to Spark's LRU/context
    # cleanup — callers return lazy frames, so an eager unpersist here
    # would force a materialization they may never need in full
    return emb.join(bucket_keys, on="vec_id").cache()


def lsh_bucketed_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    n_queries: int | None = 10,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket join + exact
    rescoring within buckets, over ``n_tables`` independent hash tables
    (union of candidates — the standard recall amplification: recall
    1-(1-p^planes)^tables).

    The plane matrix is a seeded numpy draw shipped as a BROADCAST
    ``(t, p, plane)`` table — ``n_tables * n_planes`` rows — and the
    sign bits come from one crossJoin + groupBy.  Building the planes as
    per-dimension expression trees instead would put dim x planes x
    tables (~25k at dim 768) nodes into every query plan and stall
    Catalyst before a single task runs.
    """
    from pyspark.sql import Window

    bucketed = _lsh_bucketed(embeddings, n_planes, n_tables, seed)
    queries = bucketed.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("va"), "bucket"
    )
    if n_queries is not None:
        queries = queries.where(F.col("query_id") < n_queries)
    cands = (
        queries.join(
            bucketed.select(
                F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vb"), "bucket"
            ),
            on="bucket",
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = with_cosine(cands).withColumn("cos", F.round("cos", 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.4,
    method: str = "lsh",
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos) with
    vec_a < vec_b and cosine >= threshold.

    ``method="exact"`` — the all-pairs correctness baseline (and DuckDB
    oracle); quadratic, only for verification scale.  ``method="lsh"`` —
    the scale path: candidates from multi-table hyperplane buckets, then
    exact rescoring; recall < 1 by design (amplified by n_tables — fewer
    planes/more tables than top-k search because near-dup thresholds
    want high recall at high similarity).
    """
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    if method == "exact":
        a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
        b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b).where(F.col("vec_a") < F.col("vec_b"))
    else:
        bucketed = _lsh_bucketed(embeddings, n_planes, n_tables, seed)
        l = bucketed.select(F.col("vec_id").alias("vec_a"), "bucket")
        r = bucketed.select(F.col("vec_id").alias("vec_b"), "bucket")
        # candidate generation + dedup move ID PAIRS only — the heavy
        # embedding payload (dim doubles per side) is re-attached AFTER
        # the n_tables-way duplicate collapse, so the dedup exchange
        # carries 16 bytes/row instead of ~2*dim*8 (guide §8: decide
        # with small rows, move big rows once)
        pair_ids = (
            l.join(r, on="bucket")
            .where(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
            .dropDuplicates(["vec_a", "vec_b"])
        )
        pairs = pair_ids.join(
            emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va")),
            on="vec_a",
        ).join(
            emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")),
            on="vec_b",
        )
    scored = with_cosine(pairs).withColumn("cos", F.round("cos", 6))
    return scored.where(F.col("cos") >= threshold).select("vec_a", "vec_b", "cos")


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to LSH
# ---------------------------------------------------------------------------


def ivf_centroids(embeddings: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Deterministic coarse quantizer: the ``n_centroids`` vectors whose
    md5(vec_id) is smallest — a uniform hash pick that the DuckDB oracle
    replicates byte-for-byte.  Lloyd refinement would tighten the cells
    but is deliberately omitted: the one-pass pick has no k-means
    shuffle, and recall is recovered by probing several cells
    (``n_probe``).  Returns (cid, cvec).  TakeOrdered top-K — no global
    sort materializes."""
    return (
        embeddings.select(
            F.col("vec_id").alias("cid"),
            _as_double("embedding").alias("cvec"),
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(n_centroids)
        .select("cid", "cvec")
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, v, cid): every vector joins the BROADCAST centroid table
    and keeps its max-cosine cell via a struct-min aggregation (no
    window over big partitions).  Cosines are rounded to 6 dp BEFORE the
    argmax so cell assignment is reproducible cross-engine."""
    e = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    cos = _dot(F.col("v"), F.col("cvec")) / (
        _norm(F.col("v")) * _norm(F.col("cvec"))
    )
    scored = e.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "cid", F.round(cos, 6).alias("ccos")
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct((-F.col("ccos")).alias("nc"), F.col("cid"))).alias("b")
    )
    return (
        e.join(best, on="vec_id").select("vec_id", "v", F.col("b.cid").alias("cid"))
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``n_probe`` closest
    cells and exactly rescores only those cells' members — the candidate
    set shrinks by ~n_probe/n_centroids vs brute force, and the whole
    plan is two broadcast joins plus one equi-join on the cell id (the
    100-TB shape: no crossJoin against the full corpus).

    Returns (query_id, neighbor_id, rank, cos), rank 1 = most similar.
    """
    from pyspark.sql import Window

    cents = ivf_centroids(embeddings, n_centroids)
    assign = ivf_assign(embeddings, cents)

    q = assign.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qcos = _dot(F.col("qv"), F.col("cvec")) / (
        _norm(F.col("qv")) * _norm(F.col("cvec"))
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "cid", F.round(qcos, 6).alias("ccos")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cid"))
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    cands = probes.join(assign, on="cid").where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def kmeans_clusters(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: int = 1_000_000,
    offset: int = 1_000_000,
) -> DataFrame:
    """Deterministic Lloyd's k-means over the embedding column, in
    EXACT integer arithmetic so the DuckDB oracle replays every
    assignment bit-for-bit (no float summation-order divergence):

    * vectors quantize to ``round(x * scale) + offset`` int64 (offset
      keeps them positive, so the rounding division below is plain
      floor division in both engines; distances are offset-invariant);
    * init centroids = the k vectors with lexicographically smallest
      ``md5(vec_id)`` (the IVF seed trick), cluster j = md5 rank;
    * each iteration assigns ``argmin_j ||v - c_j||^2`` (ties to the
      smallest j) and recomputes ``c_jd = (sum_d + n//2) // n``
      (round-half-up integer mean); empty clusters keep their previous
      centroid;
    * returns the LAST assignment: (vec_id, cluster, dist2).

    Physical shape: assignment is one Arrow-vectorized pandas UDF pass
    over broadcast centroids (numpy int64 — the (n, k, d) distance
    kernel is C-speed; an expression-tree alternative would evaluate
    interpreted per row); the centroid update is a codegen'd
    posexplode + (cluster, dim) aggregation whose k*d partial sums are
    the only driver-side rows.  Driver actions: iters collects of k*d
    rows — the standard k-means control loop.
    """
    v = embeddings.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: (
                F.round(x.cast("double") * scale).cast("long") + offset
            ),
        ).alias("v"),
    ).cache()

    seeds = (
        v.select(
            "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"), "v"
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [list(map(int, r.v)) for r in seeds]
    dim = len(centroids[0])

    def assigner(cents):
        carr = np.asarray(cents, dtype=np.int64)

        @F.pandas_udf("struct<cluster:int, dist2:long>")
        def assign(col: pd.Series) -> pd.DataFrame:
            M = np.stack(col.to_numpy()).astype(np.int64)
            d2 = ((M[:, None, :] - carr[None, :, :]) ** 2).sum(axis=2)
            cl = d2.argmin(axis=1)  # ties -> first (smallest j)
            return pd.DataFrame(
                {"cluster": cl.astype("int32"),
                 "dist2": d2[np.arange(len(cl)), cl]}
            )

        return assign

    assigned = None
    for _ in range(iters):
        assigned = v.select(
            "vec_id", "v", assigner(centroids)("v").alias("a")
        ).select(
            "vec_id", "v",
            F.col("a.cluster").alias("cluster"),
            F.col("a.dist2").alias("dist2"),
        )
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "vd"))
            .groupBy("cluster", "pos")
            .agg(F.sum("vd").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cluster.setdefault(int(r.cluster), {})[int(r.pos)] = (
                int(r.s),
                int(r.n),
            )
        centroids = [list(c) for c in centroids]  # empty cluster keeps old
        for j, dims in by_cluster.items():
            centroids[j] = [
                (dims[p][0] + dims[p][1] // 2) // dims[p][1]
                for p in range(dim)
            ]
    out = assigned.select("vec_id", "cluster", "dist2")
    out = out.localCheckpoint(eager=True)
    v.unpersist()
    return out
