"""Deterministic HyperLogLog cardinality — grouped approximate
COUNT(DISTINCT) that two engines can replay bit-for-bit.

Spark's ``approx_count_distinct`` is a black-box HLL++ whose register
hashing is engine-private; a curation pipeline that audits its counts
across engines (or across re-runs after a repartition) needs the
sketch itself to be a pure function of the DATA.  This is the
HyperBall register construction (kernels/hyperball.py) lifted to an
arbitrary key: register index and rho derive from ``md5(key|seed)``
(the repo-wide cross-engine hash trick), the per-group state is the
register-wise MAX — one grouped aggregation, map-side combinable,
never more than groups x R rows — and the harmonic sum stays an EXACT
integer until the single final float estimate.

Flajolet et al. 2007 (public literature) estimator with the paper's
small-range correction (linear counting ``R*ln(R/V)`` when the raw
estimate is <= 2.5R and V>0 registers are empty — the raw estimator
is ~2x biased there), b=5 / R=32 registers (~18% rse): small on
purpose — the contract pins exact replayability, and callers needing
tighter error raise ``b`` at the cost of state (the alpha constant is
tuned for b=5 only, matching hyperball).  The correction branch is
cross-engine safe: V is an exact integer 1..R, so ``ln(R/V)`` takes
only R distinct irrational values, never at a 1e-6 rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ALPHA_32 = 0.697


def approx_distinct(
    df: DataFrame,
    key_cols: list[str],
    group_cols: list[str] | None = None,
    b: int = 5,
    rmax: int = 40,
    seed: int = 7,
) -> DataFrame:
    """Per group (or globally), the deterministic HLL estimate of
    COUNT(DISTINCT key_cols): returns group columns + (s_int, n_zero,
    approx_distinct) where s_int is the exact integer harmonic sum and
    n_zero the exact count of empty registers (the two sketch
    statistics; the float estimate is derived from them alone)."""
    if b != 5:
        raise ValueError("approx_distinct: only b=5 (32 registers) is tuned")
    if not key_cols:
        raise ValueError("approx_distinct: key_cols must be non-empty")
    R = 1 << b
    group_cols = group_cols or []

    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols]
    )
    h = F.md5(F.concat_ws("|", key, F.lit(str(seed))))
    j = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % R
    w32 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    rho = F.least(
        F.when(w32 == 0, F.lit(rmax)).otherwise(
            F.lit(33) - F.length(F.bin(w32))
        ),
        F.lit(rmax),
    ).cast("int")

    regs = (
        df.select(*group_cols, j.alias("j"), rho.alias("r"))
        .groupBy(*group_cols, "j")
        .agg(F.max("r").alias("r"))
    )
    s_present = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - r)"))
    n_present = F.count(F.lit(1))
    s_int = (
        s_present
        + (F.lit(R) - n_present) * F.lit((1 << rmax)).cast("long")
    ).cast("long")
    n_zero = (F.lit(R) - n_present).cast("int")
    raw = F.lit(float(_ALPHA_32 * R * R * (1 << rmax))) / F.col("s_int")
    # Flajolet small-range correction: linear counting when the raw
    # estimate is in the biased regime and empty registers remain
    est = F.round(
        F.when(
            (raw <= F.lit(2.5 * R)) & (F.col("n_zero") > 0),
            F.lit(float(R)) * F.log(F.lit(float(R)) / F.col("n_zero")),
        ).otherwise(raw),
        6,
    )
    return (
        regs.groupBy(*group_cols)
        .agg(s_int.alias("s_int"), n_zero.alias("n_zero"))
        .select(
            *group_cols, "s_int", "n_zero", est.alias("approx_distinct")
        )
    )


def random_projection(
    emb: DataFrame,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    scale: int = 1_000_000,
) -> DataFrame:
    """Johnson-Lindenstrauss sign projection to ``out_dim`` dims —
    the cheap dimensionality reducer ahead of LSH/IVF indexing
    (Achlioptas 2003 database-friendly projections, public
    literature).

    The projection matrix entry R[i,j] ∈ {+1,-1} derives from
    ``md5(i|j|seed)`` parity and the input coordinates are quantized
    to integer ``1/scale`` units FIRST, so every output component is
    an exact BIGINT sum — aggregation order cannot flip a bit, and a
    SQL oracle replays the whole projection from the same md5 calls.

    Returns (id, j, y_q) rows: component j of the projected vector in
    integer 1/scale units.  Row layout (not array) keeps the result
    order-insensitive for hashing and lets downstream group on j.

    Scale shape: posexplode + one grouped integer sum per (id, j) —
    linear in n·d·out_dim/…: the ±1 matrix is generated as a
    broadcast ``out_dim × d`` expression table, never collected.
    """
    d_row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if d_row is None:
        return emb.sparkSession.createDataFrame(
            [], f"{id_col} long, j int, y_q long"
        )
    d = int(d_row.d)
    spark = emb.sparkSession

    proj = spark.range(d).select(
        F.col("id").cast("int").alias("i"),
        F.explode(
            F.sequence(F.lit(0), F.lit(out_dim - 1))
        ).alias("j"),
    )
    sign = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("i").cast("string"),
                        F.col("j").cast("string"),
                        F.lit(str(seed)),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    proj = F.broadcast(proj.select("i", "j", sign.alias("s")))

    comps = emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select(
        "id",
        "i",
        F.round(F.col("x").cast("double") * scale).cast("long").alias("xq"),
    )
    return (
        comps.join(proj, on="i")
        .groupBy("id", "j")
        .agg(F.sum(F.col("xq") * F.col("s")).alias("y_q"))
        .withColumnRenamed("id", id_col)
    )
