"""Similarity search over the ``embeddings`` table (array<float>).

* ``brute_force_topk`` — exact cosine top-k: the correctness baseline.
  Dot product via zip_with + aggregate (JVM-side, codegen), doubles all
  the way so the DuckDB oracle (list_cosine_similarity on DOUBLE[])
  matches to 6 dp.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH buckets
  prune the candidate set before exact rescoring.  Hyperplanes are
  seeded xxhash64-derived (deterministic, no driver-side randomness);
  at 100 TB the bucket join replaces the quadratic cross join with a
  per-bucket blow-up bounded by bucket occupancy.
"""

from __future__ import annotations

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

    Plane (t, p)'s component for dimension d is a deterministic
    pseudo-random value in [-1, 1): (xxhash64(t, p, d, seed) % 2^20) /
    2^19 - 1 — fully engine-side, reproducible, no collected state.
    """
    from pyspark.sql import Window

    dim = len(embeddings.select("embedding").first()[0])
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v"))

    def bucket_key(vcol, t):
        bits = [F.lit(str(t))]
        for p in range(n_planes):
            comp = _dot(
                vcol,
                F.array(
                    *[
                        (
                            F.pmod(
                                F.xxhash64(F.lit(t), F.lit(p), F.lit(d), F.lit(seed)),
                                F.lit(1 << 20),
                            ).cast("double")
                            / F.lit(float(1 << 19))
                            - F.lit(1.0)
                        )
                        for d in range(dim)
                    ]
                ),
            )
            bits.append(F.when(comp >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    buckets = F.array(*[bucket_key(F.col("v"), t) for t in range(n_tables)])
    bucketed = (
        emb.withColumn("bucket", F.explode(buckets)).cache()
    )
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
