"""Seeded random-graph sources (S5).

The reference uses the nodes lib's generators — ER ``random(n, m)`` /
``random(n, p)`` / ``randomDirected``, preferential attachment
(call sites Synthetic.java:104,170; MotifModelTest.java:103,444,648).
Here every generator is a deterministic Spark expression over
``spark.range`` + seeded xxhash64 — no driver-side RNG, reproducible at
any scale, uniform over the hash codomain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def random_edges(
    spark: SparkSession, n: int, m: int, seed: int = 42, directed: bool = True
) -> DataFrame:
    """≈ER G(n, m): m draws of hashed endpoint pairs, self-loops dropped,
    deduped (so the realized edge count is slightly below m for dense
    requests — same contract as rejection sampling)."""
    e = (
        spark.range(m)
        .select(
            F.pmod(F.xxhash64("id", F.lit(seed), F.lit("s")), F.lit(n)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(seed), F.lit("d")), F.lit(n)).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    if not directed:
        e = e.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
    return e.dropDuplicates(["src", "dst"])


def random_edges_p(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = True
) -> DataFrame:
    """ER G(n, p): enumerate vertex pairs, keep each with hashed
    probability p.  O(n^2) enumeration — fixture-scale only (the
    reference's random(n, p) is likewise used only in tests)."""
    pairs = (
        spark.range(n)
        .select(F.col("id").alias("src"))
        .crossJoin(spark.range(n).select(F.col("id").alias("dst")))
        .where(F.col("src") != F.col("dst"))
    )
    if not directed:
        pairs = pairs.where(F.col("src") < F.col("dst"))
    keep = (
        F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1 << 30))
        < F.lit(int(p * (1 << 30)))
    )
    return pairs.where(keep)


def preferential_attachment(
    spark: SparkSession, n: int, m_per_node: int = 2, seed: int = 42
) -> DataFrame:
    """Barabási–Albert-style graph, driver-side (fixture scale — the
    reference uses PA graphs only in experiments/tests)."""
    import random as _random

    rng = _random.Random(seed)
    targets: list[int] = [0, 1]
    edges = [(0, 1)]
    for v in range(2, n):
        chosen: set[int] = set()
        while len(chosen) < min(m_per_node, v):
            chosen.add(targets[rng.randrange(len(targets))])
        for t in chosen:
            edges.append((min(v, t), max(v, t)))
            targets.extend([v, t])
    return spark.createDataFrame(sorted(set(edges)), "src long, dst long")
