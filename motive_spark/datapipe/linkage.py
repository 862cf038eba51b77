"""Record-linkage candidate generation: blocking + bounded fuzzy
comparison.

Entity resolution at corpus scale never compares all pairs — it
partitions rows into BLOCKS by a cheap deterministic key (phonetic
code, token, length bucket) and compares only within a block.  This
module additionally exploits two structural facts the naive
within-block self-join ignores:

1. **Distances are a function of the NAME pair, not the row pair.**
   All comparison work runs over the distinct ``(block, name)`` table;
   qualifying name pairs expand back to row pairs by two hash joins
   (output-sized work).  On duplicate-heavy data this collapses the
   comparison space by the square of the duplication factor (guide-§8
   shape: decide with small rows, expand to big rows once).
2. **For ``max_distance <= 2`` candidates come from a
   deletion-neighborhood equi-join** (symmetric-delete / SymSpell,
   public algorithm): two strings within levenshtein distance d always
   share a string reachable by deleting at most d characters from
   each, so hashing every <=d-deletion variant and equi-joining on
   (block, variant hash) yields a candidate superset WITHOUT any
   quadratic self-join — Σ block² becomes the near-duplicate density.
   Hash collisions only ADD candidates (exact ``levenshtein`` verifies
   every candidate), never drop one.  Larger ``max_distance`` falls
   back to the within-block distinct-name self-join with a packed
   character-count prefilter.

Verification is exact ``levenshtein`` (JVM codegen'd in Spark;
byte-identical in DuckDB, so the oracle replays every distance).

Skew control mirrors the dedup tier's df-cap: blocks larger than
``max_block_size`` members are DROPPED (a power block is almost always
a junk key — empty names, a default value); the cap also bounds the
variant fan-out a single degenerate block can contribute.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 high-frequency characters for the packed count signature (space
# first: multi-token names split on it).  Any choice of chars yields a
# valid bound; frequent ones discriminate best.
_SIG_CHARS = " etaoinshrdlucmf"


def _deletion_variants(name: str, max_distance: int) -> Column:
    """Array of every string reachable from ``name`` by deleting at
    most ``max_distance`` (<= 2) characters — the string itself, all
    single deletions, and (for d=2) all ordered double deletions."""
    s = F.col(name)
    ln = F.length(s)
    parts = [F.array(s)]
    if max_distance >= 1:
        del1 = F.when(
            ln >= 1,
            F.expr(
                f"transform(sequence(1, length({name})), i -> "
                f"concat(substr({name}, 1, i - 1), substr({name}, i + 1)))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        parts.append(del1)
    if max_distance >= 2:
        del2 = F.when(
            ln >= 2,
            F.expr(
                f"flatten(transform(sequence(1, length({name}) - 1), i -> "
                f"transform(sequence(i + 1, length({name})), j -> "
                f"concat(substr({name}, 1, i - 1), "
                f"substr({name}, i + 1, j - i - 1), "
                f"substr({name}, j + 1)))))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        parts.append(del2)
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def _sig(col: str) -> Column:
    """Character counts packed into 4-bit lanes of one BIGINT,
    saturated at 15.  One edit changes at most two per-character
    counts by 1, so for any char set S, sum_{c in S} |cnt_a(c) -
    cnt_b(c)| <= 2 * levenshtein(a, b); capping is 1-Lipschitz so the
    capped L1 only shrinks and the bound stays valid."""
    sig = None
    for i, ch in enumerate(_SIG_CHARS):
        lane = F.least(
            F.length(col)
            - F.length(F.replace(F.col(col), F.lit(ch), F.lit(""))),
            F.lit(15),
        ).cast("long")
        term = F.shiftleft(lane, 4 * i)
        sig = term if sig is None else sig + term
    return sig


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
    are excluded before candidate generation.
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
    # ---- comparison over DISTINCT (block, name) ---------------------
    # cached: feeds the path decision below plus both candidate sides
    dn = base.select("_blk", "_nm").distinct().cache()
    # the deletion neighborhood is ~len^2/2 variants per distinct name
    # — quadratic in name LENGTH, so it is only the right candidate
    # generator for genuinely name-shaped strings.  The path must be
    # chosen globally (a per-row mix would lose pairs straddling the
    # two generators), so one tiny agg decides it from the data.
    use_deletion = max_distance <= 2
    if use_deletion:
        mx = dn.agg(F.max(F.length("_nm")).alias("m")).collect()[0]["m"]
        use_deletion = mx is not None and mx <= 128
    # distinct column names per side: a self-join on the same lineage
    # resolves `a._blk == b._blk` as trivially true (repo gotcha) —
    # rename, join, drop
    na = dn.select(
        F.col("_blk").alias("_blk_a"), F.col("_nm").alias("_n1")
    )
    nb = dn.select(
        F.col("_blk").alias("_blk_b"), F.col("_nm").alias("_n2")
    )
    if use_deletion:
        # deletion-neighborhood candidate join.  Soundness: take an
        # optimal alignment witnessing levenshtein(a, b) = d' <= d;
        # deleting from `a` its deleted/substituted characters (<= d')
        # and from `b` its inserted/substituted characters (<= d')
        # leaves the SAME string, so every qualifying pair shares a
        # <=d-deletion variant and survives the equi-join.  The 64-bit
        # variant hash can only merge DIFFERENT variants (adding a
        # candidate the verification below rejects), never separate
        # equal ones — no qualifying pair is ever lost.
        v = dn.select(
            "_blk",
            "_nm",
            F.explode(_deletion_variants("_nm", max_distance)).alias("_var"),
        ).select("_blk", "_nm", F.xxhash64("_var").alias("_h"))
        va = v.select(
            F.col("_blk").alias("_vb"),
            F.col("_nm").alias("_vn1"),
            F.col("_h").alias("_ha"),
        )
        vb = v.select(
            F.col("_blk").alias("_vbb"),
            F.col("_nm").alias("_vn2"),
            F.col("_h").alias("_hb"),
        )
        cand = (
            va.join(
                vb,
                (F.col("_ha") == F.col("_hb"))
                & (F.col("_vb") == F.col("_vbb"))
                & (F.col("_vn1") < F.col("_vn2")),
            )
            .select(
                F.col("_vb").alias("_blk_a"),
                F.col("_vn1").alias("_n1"),
                F.col("_vn2").alias("_n2"),
            )
            .dropDuplicates()
        )
        extra_ok = F.lit(True)
    else:
        # fallback: within-block self-join of distinct names, pruned
        # per pair by the packed character-count signature — a
        # NECESSARY condition for levenshtein <= max_distance in ~16
        # integer ops instead of the banded DP.
        cand = na.withColumn("_sig_a", _sig("_n1")).join(
            nb.withColumn("_sig_b", _sig("_n2")),
            (F.col("_blk_a") == F.col("_blk_b"))
            & (F.col("_n1") < F.col("_n2")),
        )
        extra_ok = (
            F.expr(
                " + ".join(
                    f"abs(((_sig_a >> {4 * i}) & 15)"
                    f" - ((_sig_b >> {4 * i}) & 15))"
                    for i in range(len(_SIG_CHARS))
                )
            )
            <= 2 * max_distance
        )
    # bounded levenshtein verification: the threshold form computes a
    # banded DP (O(len * max_distance) per pair instead of O(len^2))
    # and returns -1 when the true distance exceeds the bound — for
    # every KEPT pair (distance <= max_distance) it returns the exact
    # distance, and -1 always fails ``>= min_distance`` (min_distance
    # >= 0), so results are bit-identical to the unbounded form.  A
    # |len| prefilter short-circuits first: levenshtein >= the length
    # difference, so no qualifying pair is lost.
    d = F.levenshtein(F.col("_n1"), F.col("_n2"), max_distance)
    len_ok = (
        F.abs(F.length(F.col("_n1")) - F.length(F.col("_n2")))
        <= max_distance
    )
    np = cand.where(
        len_ok & extra_ok & (d >= min_distance) & (d <= max_distance)
    ).select("_blk_a", "_n1", "_n2", d.alias("distance"))
    # both orientations: a qualifying ROW pair (ka < kb) may have its
    # smaller key on either name of the unordered name pair
    np_bi = np.unionByName(
        np.select(
            "_blk_a",
            F.col("_n2").alias("_n1"),
            F.col("_n1").alias("_n2"),
            "distance",
        )
    )
    if min_distance == 0:
        # identical-name row pairs (distance 0) never meet the _n1<_n2
        # candidate joins; emit each distinct non-null name once (the
        # key inequality below keeps every unordered row pair once)
        np_bi = np_bi.unionByName(
            dn.where(F.col("_nm").isNotNull()).select(
                F.col("_blk").alias("_blk_a"),
                F.col("_nm").alias("_n1"),
                F.col("_nm").alias("_n2"),
                F.lit(0).alias("distance"),
            )
        )
    # ---- expansion back to row pairs (output-sized work) ------------
    rows_a = base.select(
        F.col("_blk").alias("_rba"),
        F.col("_nm").alias("_rna"),
        F.col("_k").alias(f"a_{key_col}"),
        *[F.col(c).alias(f"a_{c}") for c in carry],
    )
    rows_b = base.select(
        F.col("_blk").alias("_rbb"),
        F.col("_nm").alias("_rnb"),
        F.col("_k").alias(f"b_{key_col}"),
        *[F.col(c).alias(f"b_{c}") for c in carry],
    )
    return (
        np_bi.join(
            rows_a,
            (F.col("_blk_a") == F.col("_rba"))
            & (F.col("_n1") == F.col("_rna")),
        )
        .join(
            rows_b,
            (F.col("_blk_a") == F.col("_rbb"))
            & (F.col("_n2") == F.col("_rnb")),
        )
        .where(F.col(f"a_{key_col}") < F.col(f"b_{key_col}"))
        .select(
            f"a_{key_col}",
            f"b_{key_col}",
            F.col("_n1").alias(f"a_{name_col}"),
            F.col("_n2").alias(f"b_{name_col}"),
            "distance",
            *[f"a_{c}" for c in carry],
            *[f"b_{c}" for c in carry],
        )
    )
