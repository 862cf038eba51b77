"""Record-linkage candidate generation: blocking + bounded fuzzy
comparison.

Entity resolution at corpus scale never compares all pairs — it
partitions rows into BLOCKS by a cheap deterministic key (phonetic
code, token, length bucket) and compares only within a block, turning
the O(n²) comparison space into Σ block² with block sizes the operator
controls.  This module gives the two halves as DataFrame ops:

- blocking: a column-expression key (caller-supplied exprs, e.g.
  last token + length bucket) — one shuffle on the block key;
- comparison: a within-block self-join (``a.key < b.key``) scored by
  ``levenshtein`` (JVM codegen'd in Spark; byte-identical in DuckDB,
  so the oracle replays every distance).

Skew control mirrors the dedup tier's df-cap: blocks larger than
``max_block_size`` are DROPPED (a power block is almost always a junk
key — empty names, a default value) rather than silently exploding a
task to block² rows; the cap is the explicit quadratic-blowup guard a
100-TB run needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_link_pairs(
    df: DataFrame,
    key_col: str,
    name_col: str,
    block_exprs: list[Column],
    max_distance: int,
    min_distance: int = 0,
    max_block_size: int | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate entity pairs within blocks: returns
    ``(a_<key>, b_<key>, a_<name>, b_<name>, distance [, a_/b_ carry
    cols])`` for pairs in the same block with
    ``min_distance <= levenshtein <= max_distance``.

    ``block_exprs`` are the blocking key components (cast to string and
    concatenated); rows whose block exceeds ``max_block_size`` members
    are excluded before the self-join.
    """
    if max_distance < 0 or min_distance < 0 or min_distance > max_distance:
        raise ValueError("blocked_link_pairs: bad distance bounds")
    carry = list(carry_cols or [])
    blk = F.concat_ws(
        "\x1f", *[e.cast("string") for e in block_exprs]
    ).alias("_blk")
    base = df.select(
        F.col(key_col).alias("_k"), F.col(name_col).alias("_nm"), blk, *carry
    )
    if max_block_size is not None:
        sizes = base.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bc"))
        base = (
            base.join(
                F.broadcast(sizes.where(F.col("_bc") <= max_block_size)),
                "_blk",
            )
            .drop("_bc")
        )
    # distinct block-column names per side: a self-join on the same
    # lineage resolves `a._blk == b._blk` as trivially true (repo
    # gotcha) — rename, join, drop
    a = base.select(
        F.col("_blk").alias("_blk_a"),
        F.col("_k").alias(f"a_{key_col}"),
        F.col("_nm").alias(f"a_{name_col}"),
        *[F.col(c).alias(f"a_{c}") for c in carry],
    )
    b = base.select(
        F.col("_blk").alias("_blk_b"),
        F.col("_k").alias(f"b_{key_col}"),
        F.col("_nm").alias(f"b_{name_col}"),
        *[F.col(c).alias(f"b_{c}") for c in carry],
    )
    # bounded levenshtein: the threshold form computes a banded DP
    # (O(len * max_distance) per pair instead of O(len^2)) and returns
    # -1 when the true distance exceeds the bound — for every KEPT pair
    # (distance <= max_distance) it returns the exact distance, and -1
    # always fails ``>= min_distance`` (min_distance >= 0), so results
    # are bit-identical to the unbounded form.  A |len(a)-len(b)| <=
    # max_distance prefilter short-circuits first: levenshtein >= the
    # length difference, so no qualifying pair is lost and most
    # non-candidates never evaluate the DP at all.
    d = F.levenshtein(
        F.col(f"a_{name_col}"), F.col(f"b_{name_col}"), max_distance
    )
    len_ok = (
        F.abs(
            F.length(F.col(f"a_{name_col}"))
            - F.length(F.col(f"b_{name_col}"))
        )
        <= max_distance
    )
    return (
        a.join(
            b,
            (F.col("_blk_a") == F.col("_blk_b"))
            & (F.col(f"a_{key_col}") < F.col(f"b_{key_col}")),
        )
        .where(len_ok & (d >= min_distance) & (d <= max_distance))
        .select(
            f"a_{key_col}",
            f"b_{key_col}",
            f"a_{name_col}",
            f"b_{name_col}",
            d.alias("distance"),
            *[f"a_{c}" for c in carry],
            *[f"b_{c}" for c in carry],
        )
    )
