"""Explicit skew handling: salted equi-joins and hot-key detection.

A shuffle join hashes rows to reducers BY KEY, so one hot key (the
hub vertex, the front page, the NULL-ish default) lands its entire
row set on one task — the single straggler that stalls a 1000-executor
stage.  AQE's skew-join splitting handles sort-merge joins after the
fact; this module gives the explicit, plan-level treatment for when
you know the skew is coming (the north rule names hub-vertex skew as
a first-class concern):

- ``top_keys_by_count``: the cheap pre-pass that FINDS hot keys (an
  exact count aggregate is map-side combinable, so this costs one
  small shuffle of partial counts, never a row shuffle).
- ``salted_join``: spread each left row over ``n_salts`` sub-keys via
  a deterministic md5 salt and replicate the right side ``n_salts``
  times, so a key with F rows becomes ``n_salts`` tasks of F/n_salts
  rows.  Row-level results are EXACTLY those of the plain join (the
  salt is internal), so correctness oracles are unchanged.

Replicating the right side multiplies its shuffle volume by
``n_salts`` — salt only when the right side is much smaller than the
hot key's row count (the usual case: a medium dimension too big to
broadcast joined by a skewed fact).  ``only_keys`` restricts both the
salting and the replication to the listed hot keys, unioning the
untouched remainder through a plain join — the surgical form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_keys_by_count(
    df: DataFrame, key_cols: list[str], top_k: int = 10
) -> DataFrame:
    """Exact per-key row counts, largest first — the skew pre-pass.
    Map-side partial aggregation means the shuffle carries one row per
    (partition, key), not per input row."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.desc("n_rows"), *key_cols)
        .limit(top_k)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    only_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right ON on`` with the left side's rows
    spread across ``n_salts`` salted sub-keys and the right side
    replicated to match.  Output rows (and their multiplicity) are
    identical to the plain join.

    The salt is md5 of the whole left row (deterministic, no RNG
    state), so re-runs place every row identically.  With
    ``only_keys``, only those keys take the salted path; the rest
    flow through an ordinary join untouched.
    """
    if n_salts < 2:
        raise ValueError("salted_join: n_salts must be >= 2")
    if how != "inner":
        raise ValueError("salted_join: only inner joins are supported")
    lcols, rcols = left.columns, right.columns
    overlap = [c for c in rcols if c in lcols and c != on]
    if overlap:
        raise ValueError(
            f"salted_join: overlapping non-key columns {overlap}; "
            "alias them before joining"
        )
    if only_keys is not None:
        hot = F.col(on).isin(list(only_keys))
        plain = left.where(~hot).join(right.where(~hot), on, "inner")
        salted = salted_join(
            left.where(hot), right.where(hot), on, n_salts=n_salts
        )
        return plain.unionByName(salted)

    salt = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                            for c in lcols])),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(n_salts),
    )
    l_s = left.withColumn("_salt", salt)
    r_s = right.crossJoin(
        F.broadcast(
            left.sparkSession.range(n_salts).select(
                F.col("id").cast("long").alias("_salt")
            )
        )
    )
    out = l_s.join(r_s, [on, "_salt"], "inner").drop("_salt")
    # restore the plain join's column order
    return out.select(*lcols, *[c for c in rcols if c != on])


def _bloom_bit(key_col: str, j: int, n_bits: int):
    """Bit j of a key: md5(key|j) mod n_bits — engine-portable."""
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col(key_col).cast("string"), F.lit(str(j))
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(n_bits),
    )


def _probe_rows(
    keys: DataFrame, key_col: str, n_hashes: int, n_bits: int
) -> DataFrame:
    """(key, h, bit) — every key fanned out to its n_hashes positions."""
    probes = [
        keys.select(
            F.col(key_col),
            F.lit(j).alias("h"),
            _bloom_bit(key_col, j, n_bits).alias("bit"),
        )
        for j in range(n_hashes)
    ]
    out = probes[0]
    for p in probes[1:]:
        out = out.unionByName(p)
    return out


def bloom_bits(
    keys: DataFrame, key_col: str, n_hashes: int = 3, n_bits: int = 65536
) -> DataFrame:
    """Build a Bloom filter of ``keys`` as a DISTINCT (h, bit) position
    table — at most ``n_hashes·n_bits`` rows no matter how many keys,
    so it broadcasts.  Bit j of key x is ``md5(x|j) mod n_bits`` (the
    repo-wide engine-portable hash).

    This is the runtime-filter trick a 100-TB join lives on: ship the
    small side's Bloom bits to the fact scan and drop non-matching
    rows BEFORE the shuffle (Spark's own runtime row-group filtering
    does this opaquely; here it is an explicit, testable operator with
    false positives accounted for)."""
    return (
        _probe_rows(keys, key_col, n_hashes, n_bits)
        .select("h", "bit")
        .dropDuplicates(["h", "bit"])
    )


def bloom_semi_join(
    fact: DataFrame,
    bloom: DataFrame,
    key_col: str,
    n_hashes: int = 3,
    n_bits: int = 65536,
) -> DataFrame:
    """Rows of ``fact`` whose key passes the Bloom filter (every one of
    its ``n_hashes`` bits set).  Contains all true matches plus the
    filter's false positives — the pre-shuffle pruning semantics, as a
    DataFrame op: distinct fact keys probe the broadcast bit table,
    surviving keys semi-join the fact."""
    fk = fact.select(F.col(key_col)).dropDuplicates([key_col])
    passing = (
        _probe_rows(fk, key_col, n_hashes, n_bits)
        .join(F.broadcast(bloom), ["h", "bit"])
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .where(F.col("_hits") == n_hashes)
        .select(key_col)
    )
    return fact.join(F.broadcast(passing), key_col, "semi")
