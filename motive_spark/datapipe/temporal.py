"""Event-time operators over the ``events`` table: sessionization and
as-of joins — the temporal half of a training-data / analytics
pipeline (funnel attribution, session corpora, point-in-time feature
joins).

Cross-engine discipline (the DuckDB-oracle contract): all time
arithmetic is INTEGER micros (``unix_micros`` / ``epoch_us``),
timestamps cross the engine boundary as formatted strings, and money
aggregates in integer cents — no float or timestamp-typed column ever
reaches the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(df: DataFrame, col_name: str):
    """Integer micros since epoch for a timestamp column, TZ-FREE: for
    TIMESTAMP_NTZ uses timestampdiff against a naive epoch literal (no
    session-timezone involvement — matches DuckDB's epoch_us on naive
    timestamps exactly); plain TIMESTAMP takes unix_micros."""
    if dict(df.dtypes).get(col_name) == "timestamp_ntz":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col_name}`)"
        )
    return F.unix_micros(F.col(col_name))


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: consecutive events of one ``key`` more
    than ``gap_seconds`` apart start a new session.

    Returns one row per session:
    (user_id, session_idx, n_events, session_start, session_end,
    duration_seconds, sum_value_cents) — session_idx is 1-based in
    event-time order, timestamps are formatted strings, the value sum
    aggregates integer cents (exact cross-engine).

    Physical shape: ONE hash-partitioned window pass over (key) ordered
    by (ts, event_id) — per-key rows stream through a single task, the
    standard batch sessionization plan (a pathological power-key is the
    caller's salting decision; Structured Streaming's native
    ``session_window`` is the unbounded-stream path).
    """
    w = Window.partitionBy(key).orderBy("ts", "event_id")
    base = events.select(
        key,
        "event_id",
        F.col(ts_col).alias("ts"),
        _micros(events, ts_col).alias("us"),
        "value",
    )
    prev = F.lag("us").over(w)
    marked = base.withColumn(
        "brk",
        F.when(
            prev.isNull() | ((F.col("us") - prev) > gap_seconds * 1_000_000),
            1,
        ).otherwise(0),
    )
    sess = marked.select(
        key,
        "event_id",
        "ts",
        "us",
        "value",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_idx"),
    )
    return sess.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_start"
        ),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "session_end"
        ),
        ((F.max("us") - F.min("us")) / F.lit(1_000_000))
        .cast("long")
        .alias("duration_seconds"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "sum_value_cents"
        ),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Distributed AS-OF join: every ``left`` row is matched to the
    LATEST ``right`` row of the same ``key`` with
    ``right_ts <= left_ts`` (point-in-time semantics — the feature-store
    / attribution join Spark lacks as a built-in).

    Plan: the union-tag trick — tag right rows 0 and left rows 1, union
    on (key, ts_micros, tag), and take ``last(right payload, ignore
    nulls)`` over one (key)-partitioned window ordered by
    (ts_micros, tag).  ONE shuffle + one window pass, never an
    inequality join (a naive theta-join is O(|L|·|R|) per key and
    unusable at scale).  At equal timestamps right sorts before left,
    so a same-instant right row DOES match.  Ties inside ``right`` on
    (key, ts) must be resolved by the caller (dedupe first) for
    deterministic output.

    ``tolerance_seconds`` drops matches older than the tolerance
    (NULL payload instead), the pandas ``merge_asof`` semantics.

    Returns ``left`` plus ``right_cols`` (prefixed ``asof_``) and
    ``asof_lag_us`` (integer micros between the rows; NULL = no match).
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (key, right_ts)
        ]
    reserved = {"_us", "_tag", "_payload", "_m", "_r_us"}
    clash = reserved & (set(left.columns) | set(right_cols))
    if clash:
        # silently overwriting a caller's _us/_tag would corrupt the
        # columns echoed back from left.columns — fail loudly instead
        raise ValueError(
            f"asof_join reserves internal column names {sorted(reserved)}; "
            f"rename conflicting input columns: {sorted(clash)}"
        )
    l_us = _micros(left, left_ts)
    r_us = _micros(right, right_ts)
    lt = left.withColumn("_us", l_us).withColumn("_tag", F.lit(1))
    rt = right.select(
        key,
        r_us.alias("_us"),
        F.lit(0).alias("_tag"),
        F.struct(
            r_us.alias("_r_us"),
            *[F.col(c) for c in right_cols],
        ).alias("_payload"),
    )
    u = lt.select(
        key,
        "_us",
        "_tag",
        F.lit(None).cast(rt.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in left.columns if c != key],
    ).unionByName(
        rt.select(
            key,
            "_us",
            "_tag",
            "_payload",
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c != key
            ],
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_us", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_tag") == 1)
    )
    lag_us = F.col("_us") - F.col("_m._r_us")
    if tolerance_seconds is not None:
        keep = lag_us <= tolerance_seconds * 1_000_000
        matched = matched.withColumn(
            "_m", F.when(keep, F.col("_m")).otherwise(F.lit(None))
        )
        lag_us = F.col("_us") - F.col("_m._r_us")
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"asof_{c}") for c in right_cols],
        lag_us.alias("asof_lag_us"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    horizon_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel completion per user: the first occurrence of
    ``steps[0]``, then for each later step the FIRST occurrence
    strictly after the previous step's time and within ``horizon_us``
    microseconds of the funnel start — the standard product-analytics
    conversion query (first-touch attribution semantics).

    Returns (user, n_steps, t1_us..tK_us) with epoch-microsecond
    times, -1 for steps never reached; users who never fire step 1
    are absent.  All times are exact integers (cross-engine hashable,
    the repo's timestamp discipline).

    Scale shape: one filtered min-aggregation per step, each keyed on
    the user column (map-side combinable), chained by equi-joins on
    that same key — partitioning is reused across every stage, no
    window over the full event stream, no per-user sort.  Cost is
    len(steps) passes; at 100-TB scale filter events to the step
    types once and the passes read only funnel-relevant rows.
    """
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")
    us = _micros(events, ts_col).alias("_us")
    ev = events.select(
        F.col(user_col).alias("user"), F.col(type_col).alias("t"), us
    )
    cur = (
        ev.where(F.col("t") == steps[0])
        .groupBy("user")
        .agg(F.min("_us").alias("t1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col("t") == step).select(
            "user", F.col("_us").alias("_cand")
        )
        # conditional min, NOT a filter: a user whose previous step is
        # -1 (or whose candidates all miss the window) must keep their
        # row with t{i}_us = -1, not vanish from the funnel table
        valid = (
            (F.col(f"t{i - 1}_us") >= 0)
            & (F.col("_cand") > F.col(f"t{i - 1}_us"))
            & (F.col("_cand") <= F.col("t1_us") + F.lit(horizon_us))
        )
        cur = (
            cur.join(nxt, on="user", how="left")
            .groupBy("user", *[f"t{j}_us" for j in range(1, i)])
            .agg(
                F.min(F.when(valid, F.col("_cand"))).alias(f"t{i}_us")
            )
            .select(
                "user",
                *[f"t{j}_us" for j in range(1, i)],
                F.coalesce(f"t{i}_us", F.lit(-1)).alias(f"t{i}_us"),
            )
        )
    n_steps = F.lit(1)
    for i in range(2, len(steps) + 1):
        n_steps = n_steps + F.when(F.col(f"t{i}_us") >= 0, 1).otherwise(0)
    return cur.select(
        "user",
        n_steps.alias("n_steps"),
        *[f"t{j}_us" for j in range(1, len(steps) + 1)],
    )


def retention_cohorts(
    events: DataFrame,
    period_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the period of
    their FIRST event (periods are fixed ``period_us``-microsecond
    buckets since epoch), then counted once per (cohort, offset) for
    every later period in which they were active — the standard
    product-analytics retention matrix.

    Returns (cohort_period, offset_periods, n_users); offset 0 rows
    equal cohort sizes by construction.  All bucket math is exact
    integer floor-division.

    Scale shape: one min-aggregation keyed on the user, one distinct
    over (user, period) — both map-side combinable on the same key —
    then a broadcast-size final count; no windows, no per-user sort.
    """
    us = _micros(events, ts_col)
    acts = (
        events.select(
            F.col(user_col).alias("user"),
            (us / F.lit(period_us)).cast("long").alias("p"),
        )
        .groupBy("user", "p")
        .agg(F.lit(1))
        .select("user", "p")
    )
    cohort = acts.groupBy("user").agg(F.min("p").alias("c"))
    out = (
        acts.join(cohort, on="user")
        .select("c", (F.col("p") - F.col("c")).alias("off"))
    )
    if max_offset is not None:
        out = out.where(F.col("off") <= max_offset)
    return out.groupBy("c", "off").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(
        F.col("c").alias("cohort_period"),
        F.col("off").alias("offset_periods"),
        "n_users",
    )


def rolling_window_stats(
    events: DataFrame,
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-event trailing-window aggregates: for every event, the
    count and integer-cents value sum of the same user's events in
    the ``window_us`` microseconds ending at (and including) it — the
    feature-engineering primitive behind rate counters / velocity
    features in fraud and recommendation pipelines.

    A RANGE frame over integer micros (not ROWS): simultaneous events
    share one frame, so the result is independent of tie order — the
    property that makes it cross-engine hashable.

    Scale shape: one shuffle on the user key + an in-partition range
    frame (Spark evaluates it with a sliding two-pointer over the
    sorted partition, O(rows) state).  A pathological power user
    serializes into one task — same documented salting caveat as
    sessionize.
    """
    us = _micros(events, ts_col)
    cents = F.round(F.col(value_col).cast("double") * 100).cast("long")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("event_id"),
        us.alias("_us"),
        cents.alias("_cents"),
    )
    w = (
        Window.partitionBy("user")
        .orderBy("_us")
        .rangeBetween(-window_us, 0)
    )
    return ev.select(
        F.col("user").alias(user_col),
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_window"),
        F.sum("_cents").over(w).alias("cents_window"),
    )


def scd2_intervals(
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 from a change log: per entity,
    each attribute change opens a new version valid from its update
    time until the next change (NULL ``valid_to_us`` = current row).

    The CDC→warehouse primitive: one shuffle on the entity key, one
    ordered window per entity (bounded by that entity's update count —
    a power entity is the caller's salting decision, the sessionize
    caveat).  ``collapse_unchanged`` drops no-op updates (all
    ``attr_cols`` equal to the previous version) BEFORE the interval
    stitch, so back-to-back identical snapshots don't fragment
    versions.  Ordering is (ts, tiebreak) — pass a unique
    ``tiebreak_col`` to make same-timestamp updates deterministic.

    Returns (key, version, valid_from_us, valid_to_us, is_current,
    *attr_cols) with validity bounds as integer micros (TZ-free,
    engine-portable).
    """
    if not attr_cols:
        raise ValueError("scd2_intervals: attr_cols must be non-empty")
    us = _micros(updates, ts_col)
    order = [F.col("_us")] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    base = updates.select(
        F.col(key_col).alias("_k"),
        us.alias("_us"),
        *([F.col(tiebreak_col)] if tiebreak_col else []),
        *[F.col(c) for c in attr_cols],
    )
    w = Window.partitionBy("_k").orderBy(*order)
    if collapse_unchanged:
        changed = F.lit(False)
        for c in attr_cols:
            prev = F.lag(F.col(c)).over(w)
            # null-safe inequality: a change to/from NULL is a change
            changed = changed | ~F.col(c).eqNullSafe(prev)
        first = F.lag(F.col("_us")).over(w).isNull()
        base = base.withColumn("_keep", first | changed).where("_keep")
    w2 = Window.partitionBy("_k").orderBy(*order)
    return base.select(
        F.col("_k").alias(key_col),
        F.row_number().over(w2).alias("version"),
        F.col("_us").alias("valid_from_us"),
        F.lead(F.col("_us")).over(w2).alias("valid_to_us"),
        F.lead(F.col("_us")).over(w2).isNull().alias("is_current"),
        *[F.col(c) for c in attr_cols],
    )
