"""Graph feature engineering for ML training pipelines: GNN-style
neighborhood feature aggregation and deterministic negative-edge
sampling — the two table-producing steps between a raw link graph and
a link-prediction / node-classification training set.

Both are pure DataFrame compositions (no UDFs): aggregation is one
shuffle join + one grouped agg; negative sampling derives candidates
from md5 arithmetic (the repo-wide cross-engine hash discipline), so a
SQL oracle replays every sampled pair exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighbor_feature_agg(
    edges: DataFrame,
    features: DataFrame,
    id_col: str = "id",
    feature_cols: list[str] | None = None,
    directed: bool = False,
) -> DataFrame:
    """For every vertex, aggregate its neighbors' integer features:
    returns (id, n_nbrs, sum_<f>, min_<f>, max_<f> per feature) — the
    single-layer message-passing primitive (GraphSAGE-style mean/pool
    aggregation, public literature) materialized as a table.

    Feature columns must be integer-typed (quantize floats to cents /
    fixed-point first): integer sums are aggregation-order exact, so
    the output is engine-replayable bit-for-bit.  Vertices with no
    neighbors are absent (left-join the vertex table downstream to
    keep them).

    Scale shape: symmetrize, equi-join edge destinations against the
    feature table on its key (both sides shuffle-partitioned on that
    key — the feature table is |V| rows, NOT broadcastable at scale),
    then one map-side-combinable groupBy on the source endpoint.
    Exactly two shuffles, no windows.
    """
    if feature_cols is None:
        feature_cols = [c for c in features.columns if c != id_col]
    for c in feature_cols:
        dt = dict(features.dtypes)[c]
        if dt not in ("int", "bigint", "smallint", "tinyint"):
            raise ValueError(
                f"neighbor_feature_agg: feature {c!r} is {dt}; quantize "
                "to an integer type first (exact cross-engine sums)"
            )
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct()
    feat = features.select(
        F.col(id_col).alias("dst"),
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
    )
    aggs = [F.count(F.lit(1)).alias("n_nbrs")]
    for c in feature_cols:
        aggs += [
            F.sum(c).alias(f"sum_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return (
        e.join(feat, on="dst")
        .groupBy("src")
        .agg(*aggs)
        .withColumnRenamed("src", "id")
    )


def negative_samples(
    edges: DataFrame,
    k: int,
    seed: int = 23,
    directed: bool = False,
) -> DataFrame:
    """Deterministic negative sampling for link-prediction training:
    for every vertex u and trial t in 1..k, the candidate partner is
    the vertex at rank ``md5(u|t|seed) mod |V|`` in id order; trials
    that hit u itself or an existing edge are DROPPED, not resampled
    (rejection sampling with a fixed trial budget — the standard
    open-world negative-sampling recipe, kept replayable: the md5
    derivation and the rank->id map are pure functions of the vertex
    set, so a SQL oracle regenerates every surviving pair).

    Returns (src, dst, trial).  Expected yield per vertex is
    k * (1 - deg(u)/|V|); callers needing exactly-k oversample and
    truncate downstream.

    Scale shape: the rank->id map is the two-phase per-partition-offset
    rank (``graph.normalize.dense_index`` — range-partition, rank
    within partitions, add collected per-PARTITION offsets), never a
    single-partition global window; then an equi-join on rank and one
    anti-join against the symmetrized edge set — no candidate ever
    fans out beyond k rows per vertex.
    """
    if k <= 0:
        raise ValueError("negative_samples: k must be positive")
    from motive_spark.graph.normalize import dense_index

    e = edges.select("src", "dst")
    # the symmetrized set feeds FOUR separate actions/consumers (the
    # |V| count, the dense_index materialization, the candidate
    # derivation and the known-edge anti-join); without a cache each
    # one re-evaluates the caller's edge derivation from scratch
    sym = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .cache()
    )
    verts = sym.select(F.col("src").alias("id")).distinct()
    n = verts.count()
    # identical rank values to row_number().over(Window.orderBy("id"))-1,
    # without the |V|-row single-partition sort (VERDICT r5 #1)
    ranked = dense_index(verts.select(F.col("id").alias("_v")), "_v").select(
        F.col("_v").alias("id"), F.col("id").alias("rank")
    )
    cand = verts.select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("trial"),
    ).select(
        "src",
        "trial",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("src").cast("string"),
                            F.col("trial").cast("string"),
                            F.lit(str(seed)),
                        )
                    ),
                    1,
                    14,
                ),
                16,
                10,
            ).cast("long")
            % n
        ).alias("rank"),
    )
    pairs = (
        cand.join(ranked, on="rank")
        .select("src", F.col("id").alias("dst"), "trial")
        .where(F.col("src") != F.col("dst"))
    )
    existing = sym if not directed else e.distinct()
    return pairs.join(existing, on=["src", "dst"], how="left_anti")
