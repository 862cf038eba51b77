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


# 16^15: the normalizing denominator for a 15-hex-digit md5 prefix —
# exactly representable (2^60), so hash/16^15 is one exact IEEE divide
_KMV_DEN = float(1 << 60)


def kmv_sketch(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """K-minimum-values (theta-style) sketch per group: the k
    lexicographically smallest md5 digests of the group's DISTINCT
    keys (a string min-k IS a minhash — the repo-wide md5 ordering
    trick).  Returns (group, kmin: array<string> ascending, n_seen:
    sketch size).  Unlike HLL, KMV sketches support SET OPERATIONS:
    the k-min of a union is the k-min of the merged sketches, and
    intersections estimate via membership inside the union sketch.

    Built as one distinct + one grouped min-k (window bounded by k per
    group after a per-partition pre-prune at true scale); state is k
    digests per group."""
    if k < 2:
        raise ValueError("kmv_sketch: k must be >= 2")
    hashed = df.select(
        F.col(group_col).alias("g"),
        F.md5(F.col(key_col).cast("string")).alias("h"),
    ).dropDuplicates(["g", "h"])
    from pyspark.sql import Window

    win = Window.partitionBy("g").orderBy("h")
    return (
        hashed.withColumn("_r", F.row_number().over(win))
        .where(F.col("_r") <= k)
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmin"),
            F.count(F.lit(1)).alias("n_seen"),
        )
    )


def _kmv_estimate_expr(kmin, n_seen, k: int):
    """Distinct estimate from a sketch: exact when the group has fewer
    than k distinct keys; else (k-1)/u_k with u_k the k-th smallest
    normalized hash — both operands exact, so the divide is
    bit-identical cross-engine.  Rounded to 4 dp."""
    u_k = (
        F.conv(F.substring(F.element_at(kmin, k), 1, 15), 16, 10).cast(
            "long"
        )
        / F.lit(_KMV_DEN)
    )
    return F.round(
        F.when(n_seen < k, n_seen.cast("double")).otherwise(
            F.lit(float(k - 1)) / u_k
        ),
        4,
    )


def kmv_distinct(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """(group, est_distinct, sketch_size): KMV distinct-count estimate
    per group (~1/sqrt(k-2) relative error)."""
    sk = kmv_sketch(df, group_col, key_col, k)
    return sk.select(
        group_col,
        _kmv_estimate_expr(F.col("kmin"), F.col("n_seen"), k).alias(
            "est_distinct"
        ),
        F.col("n_seen").alias("sketch_size"),
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    key_col: str,
    group_a,
    group_b,
    k: int = 64,
) -> DataFrame:
    """One row estimating |A|, |B|, |A∪B|, |A∩B| for two groups' key
    sets from their KMV sketches only: the union sketch is the k-min
    of the merged digests; the intersection estimate is (matches in
    the union sketch belonging to both) / k × est_union (the standard
    theta-sketch a-priori estimator).  Columns: est_a, est_b,
    est_union, est_intersection."""
    sk = kmv_sketch(
        df.where(F.col(group_col).isin([group_a, group_b])),
        group_col,
        key_col,
        k,
    ).cache()
    a = sk.where(F.col(group_col) == group_a)
    b = sk.where(F.col(group_col) == group_b)
    est_a = a.select(
        _kmv_estimate_expr(F.col("kmin"), F.col("n_seen"), k).alias("est_a")
    )
    est_b = b.select(
        _kmv_estimate_expr(F.col("kmin"), F.col("n_seen"), k).alias("est_b")
    )
    merged = (
        a.select(F.explode("kmin").alias("h"), F.lit(1).alias("in_a"))
        .unionByName(
            b.select(F.explode("kmin").alias("h"), F.lit(1).alias("in_b")),
            allowMissingColumns=True,
        )
        .groupBy("h")
        .agg(
            F.max(F.coalesce("in_a", F.lit(0))).alias("in_a"),
            F.max(F.coalesce("in_b", F.lit(0))).alias("in_b"),
        )
    )
    from pyspark.sql import Window

    win = Window.orderBy("h")
    topu = merged.withColumn("_r", F.row_number().over(win)).where(
        F.col("_r") <= k
    )
    ustats = topu.agg(
        F.sort_array(F.collect_list("h")).alias("kmin"),
        F.count(F.lit(1)).alias("n_seen"),
        F.sum(
            (F.col("in_a") * F.col("in_b")).cast("long")
        ).alias("n_both"),
    )
    out = (
        ustats.select(
            _kmv_estimate_expr(F.col("kmin"), F.col("n_seen"), k).alias(
                "est_union"
            ),
            "n_both",
            "n_seen",
        )
        .crossJoin(est_a)
        .crossJoin(est_b)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("n_both") / F.col("n_seen") * F.col("est_union"), 4
            ).alias("est_intersection"),
        )
    )
    return out
