"""Count-min sketch: bounded-memory frequency estimation.

Exact token counting at 100 TB needs a shuffle keyed by the full token
vocabulary; a count-min sketch (Cormode & Muthukrishnan 2005, public
method) answers "how often does X occur?" with ``depth × width``
integer cells total — mergeable across partitions, days, and corpora,
with the one-sided guarantee estimate ≥ true count (over-estimation
bounded by ε·N with ε = e/width at probability 1−e^−depth).

Engine-portable determinism: row j's hash is the first 8 hex digits of
``md5(token || '|' || j)`` mod ``width`` — the repo-wide md5 trick —
so the DuckDB oracle rebuilds the identical sketch cell-for-cell.

Plan shape: counts are aggregated EXACTLY per token first (one
map-side-combinable shuffle — the thing being sketched away at true
scale is exactly this step, so production use would feed
``countmin_sketch`` pre-aggregated partials instead; the algebra is
identical because the sketch is linear), then each distinct token
fans out to its ``depth`` cells — a ``depth × |vocab|`` row explode of
an already-tiny table, never of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, j: int, width: int):
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("|", col, F.lit(str(j)))), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )


def countmin_sketch(
    counts: DataFrame,
    token_col: str = "token",
    count_col: str = "cnt",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Fold (token, cnt) rows into CMS cells (row_idx, bucket, cell) —
    ``depth·width`` rows max, regardless of vocabulary size."""
    rows = [
        counts.select(
            F.lit(j).alias("row_idx"),
            _bucket(F.col(token_col), j, width).alias("bucket"),
            F.col(count_col).alias("c"),
        )
        for j in range(depth)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.groupBy("row_idx", "bucket").agg(F.sum("c").alias("cell"))


def countmin_estimate(
    cms: DataFrame,
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch: per token the MIN over its depth cells
    (absent cell = 0).  Broadcasting the ≤ depth·width-cell sketch
    keeps the lookup shuffle-free."""
    probes = [
        tokens.select(
            F.col(token_col),
            F.lit(j).alias("row_idx"),
            _bucket(F.col(token_col), j, width).alias("bucket"),
        )
        for j in range(depth)
    ]
    pr = probes[0]
    for p in probes[1:]:
        pr = pr.unionByName(p)
    return (
        pr.join(F.broadcast(cms), ["row_idx", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce("cell", F.lit(0))).alias("cms_estimate"))
    )


def heavy_hitters_cms(
    docs: DataFrame,
    top_k: int = 32,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Top-k whitespace tokens by exact count, annotated with the CMS
    estimate and its (always non-negative) overestimate — the sketch
    audit a pipeline runs at small scale before trusting CMS-only
    numbers at large scale.  Returns (token, exact_count,
    cms_estimate, overestimate, rank)."""
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    cms = countmin_sketch(counts, "token", "cnt", depth, width)
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top_k)
    )
    est = countmin_estimate(cms, top.select("token"), "token", depth, width)
    from pyspark.sql import Window

    win = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        top.join(est, "token")
        .withColumn("rank", F.row_number().over(win))
        .select(
            "token",
            F.col("cnt").alias("exact_count"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("cnt")).alias("overestimate"),
            "rank",
        )
    )
