"""Market-basket association rules (pairwise Apriori level-2).

The first mining pass every recommender/affinity pipeline runs: from
(basket, item) facts, find item pairs that co-occur in more baskets
than chance and emit directed rules a→b with support / confidence /
lift.  Level-2 (pairs) is the distributed-friendly core of Apriori —
higher levels fan out from frequent pairs the same way.

Plan: distinct (basket, item) → item supports (one groupBy) → pair
supports via the within-basket self-join (``item_a < item_b`` — the
co-purchase-graph shape, quadratic per basket and therefore capped by
``max_basket_size``: a power basket contributes size² pairs, the same
df-cap discipline as the dedup tier) → min-support filter BEFORE the
metric join (Apriori pruning: infrequent pairs never join the support
table).  All counts exact integers; confidence and lift are single
float divisions of those integers rounded to 6 dp before ranking, so
the oracle replays every rule bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def association_rules(
    facts: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    top_k: int | None = 50,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Directed rules (antecedent, consequent, pair_count, ante_count,
    cons_count, confidence, lift[, rank]) for pairs co-occurring in at
    least ``min_support`` baskets.  ``top_k=None`` returns all rules
    unranked (for downstream joins); otherwise the top-k by
    (lift desc, confidence desc, antecedent, consequent)."""
    if min_support < 1:
        raise ValueError("association_rules: min_support must be >= 1")
    bi = facts.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).dropDuplicates(["b", "i"])
    if max_basket_size is not None:
        sizes = bi.groupBy("b").agg(F.count(F.lit(1)).alias("bs"))
        bi = bi.join(
            F.broadcast(sizes.where(F.col("bs") <= max_basket_size)), "b"
        ).drop("bs")
    bi = bi.cache()
    n_baskets = bi.select("b").distinct().count()
    item_cnt = bi.groupBy("i").agg(F.count(F.lit(1)).alias("ic"))
    left = bi.select(F.col("b").alias("b1"), F.col("i").alias("ia"))
    right = bi.select(F.col("b").alias("b2"), F.col("i").alias("ib"))
    pairs = (
        left.join(
            right,
            (F.col("b1") == F.col("b2")) & (F.col("ia") < F.col("ib")),
        )
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("pc"))
        .where(F.col("pc") >= min_support)  # Apriori prune pre-join
    )
    # both rule directions from each unordered pair
    directed = pairs.select(
        F.col("ia").alias("antecedent"),
        F.col("ib").alias("consequent"),
        "pc",
    ).unionByName(
        pairs.select(
            F.col("ib").alias("antecedent"),
            F.col("ia").alias("consequent"),
            "pc",
        )
    )
    rules = (
        directed.join(
            item_cnt.select(
                F.col("i").alias("antecedent"), F.col("ic").alias("ante_count")
            ),
            "antecedent",
        )
        .join(
            item_cnt.select(
                F.col("i").alias("consequent"),
                F.col("ic").alias("cons_count"),
            ),
            "consequent",
        )
        .select(
            "antecedent",
            "consequent",
            F.col("pc").alias("pair_count"),
            "ante_count",
            "cons_count",
            F.round(F.col("pc") / F.col("ante_count"), 6).alias("confidence"),
            F.round(
                (F.col("pc").cast("double") * F.lit(n_baskets))
                / (F.col("ante_count") * F.col("cons_count")),
                6,
            ).alias("lift"),
        )
    )
    bi.unpersist()
    if top_k is None:
        return rules
    top = rules.orderBy(
        F.desc("lift"), F.desc("confidence"), "antecedent", "consequent"
    ).limit(top_k)
    win = Window.orderBy(
        F.desc("lift"), F.desc("confidence"), "antecedent", "consequent"
    )
    return top.withColumn("rank", F.row_number().over(win))
