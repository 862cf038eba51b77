"""Deterministic sampling operators for training-data pipelines.

Corpus curation at 100 TB is mostly *sampling*: thin an over-represented
language to a quota, hold out a reproducible eval slice, downsample a
crawl source to a target mix.  The non-negotiable at that scale is
DETERMINISM — the sample must be a pure function of (row key, seed) so
re-runs, backfills, and cross-engine audits agree row-for-row; Spark's
built-in ``DataFrame.sample`` is partition-order dependent and
therefore unusable for curation lineage.

Two primitives, both md5-keyed (the repo-wide cross-engine hash trick):

- ``hash_sample``: keep a row iff the first 8 hex digits of
  ``md5(key|seed)``, as an integer, fall below ``frac * 2^32``.  A pure
  column-expression FILTER — no shuffle, no state, fully pushdown-able;
  per-stratum rates compose as a CASE over the stratum column.  This is
  the Bernoulli sampler with reproducible coin flips.
- ``stratified_topn``: EXACT quota per stratum — rank rows inside each
  stratum by ``md5(key|seed)`` and keep the first n.  One shuffle on
  the stratum key (a window, bounded by the quota); the md5 rank makes
  the quota sample uniform-without-replacement and replayable.

Skew note: ``stratified_topn`` windows over the stratum key, so a
power-law stratum (one language = half the corpus) concentrates in one
task; for that regime pre-thin with ``hash_sample`` at a few times the
quota rate, then take the exact top-n from the survivors — same
distribution, bounded task size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1 << 32


def _hash32(key: F.Column, seed: int) -> F.Column:
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", key, F.lit(str(seed)))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame,
    frac: float,
    key_cols: list[str],
    seed: int = 0,
    frac_by: dict[str, float] | None = None,
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic Bernoulli sample: keeps each row with probability
    ``frac`` (or ``frac_by[stratum]`` when the row's ``strata_col``
    value has an override) as a pure function of (key_cols, seed).
    Zero-shuffle — the predicate is a single column expression."""
    if not key_cols:
        raise ValueError("hash_sample: key_cols must be non-empty")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    h = _hash32(key, seed)
    if frac_by:
        if strata_col is None:
            raise ValueError("hash_sample: frac_by requires strata_col")
        thresh = F.lit(int(frac * _SCALE))
        for value, f_val in sorted(frac_by.items()):
            thresh = F.when(
                F.col(strata_col) == value, F.lit(int(f_val * _SCALE))
            ).otherwise(thresh)
    else:
        thresh = F.lit(int(frac * _SCALE))
    return df.where(h < thresh)


def stratified_topn(
    df: DataFrame,
    strata_cols: list[str],
    n: int,
    key_cols: list[str],
    seed: int = 0,
    rank_col: str = "strat_rank",
) -> DataFrame:
    """Exact uniform-without-replacement quota of ``n`` rows per
    stratum: rows ranked by md5(key|seed) inside each stratum (ties
    broken by the key string itself, so the result is total-ordered
    and engine-independent); adds ``rank_col`` (1-based)."""
    if not key_cols or not strata_cols:
        raise ValueError("stratified_topn: key and strata cols required")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    h = F.md5(F.concat_ws("|", key, F.lit(str(seed))))
    win = Window.partitionBy(*strata_cols).orderBy(h.asc(), key.asc())
    return (
        df.withColumn(rank_col, F.row_number().over(win))
        .where(F.col(rank_col) <= n)
    )


def weighted_sample_topn(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_cols: list[str],
    seed: int = 0,
    rank_col: str = "aes_rank",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–
    Spirakis A-ES scheme: each row draws u ~ Uniform(0,1] from its md5
    hash and is ranked by ``u^(1/w)`` — the top-``n`` such rows are an
    exact weighted sample without replacement (rows with weight 2w are
    selected with twice the odds of weight w at every step).

    We rank by the monotone-equivalent ``ln(u)/w`` (descending), which
    avoids the pow and keeps magnitudes sane.  The draw is a pure
    function of (key_cols, seed) so backfills and the cross-engine
    oracle replay the sample row-for-row.  ``u = (h+1)/2^32`` with h
    the first-8-hex md5 integer: both the ratio (power-of-two divisor)
    and the division by the integer weight are exactly rounded IEEE
    ops, so the only engine-sensitive op is ``ln`` — rounded to 9 dp
    before ranking (near-ties become exact ties, broken by the key
    string).

    Plan: a column-expression key + global top-n (TakeOrdered — no
    single-partition sort); the rank is stamped by a window over the
    ``n`` survivors only.  Rows with weight <= 0 are excluded (zero
    weight = never sampled, per A-ES).
    """
    if not key_cols:
        raise ValueError("weighted_sample_topn: key_cols must be non-empty")
    if n <= 0:
        raise ValueError("weighted_sample_topn: n must be positive")
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    h = _hash32(key, seed)
    u = (h + F.lit(1)).cast("double") / F.lit(float(_SCALE))
    aes = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    top = (
        df.where(F.col(weight_col).cast("double") > 0)
        .withColumn("_aes_key", aes)
        .withColumn("_aes_tie", key)
        .orderBy(F.desc("_aes_key"), F.asc("_aes_tie"))
        .limit(n)
    )
    win = Window.orderBy(F.desc("_aes_key"), F.asc("_aes_tie"))
    return (
        top.withColumn(rank_col, F.row_number().over(win))
        .drop("_aes_key", "_aes_tie")
    )
