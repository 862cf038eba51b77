"""Temporal operators: gap sessionization and as-of joins (plus the
streaming windowed-counts drain) against hand-computed fixtures."""

import datetime as dt

from pyspark.sql import functions as F


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1, 10, minute, second, micro)


def test_sessionize_gap_semantics(spark):
    from motive_spark.datapipe import sessionize

    rows = [
        # user 1: two sessions (gap > 30 min between minute 10 and 50)
        (0, _ts(0), 1, "view", 1.00, "{}"),
        (1, _ts(10), 1, "click", 2.50, "{}"),
        (2, _ts(50), 1, "purchase", 10.00, "{}"),
        # user 2: one session, single event
        (3, _ts(5), 2, "view", 0.25, "{}"),
        # user 3: events exactly 30 min apart -> SAME session (> gap
        # starts a new one, equality does not)
        (4, _ts(0), 3, "view", 1.00, "{}"),
        (5, _ts(30), 3, "view", 1.00, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    out = {
        (r.user_id, r.session_idx): r
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1), (3, 1)}
    s11 = out[(1, 1)]
    assert s11.n_events == 2 and s11.sum_value_cents == 350
    assert s11.duration_seconds == 600
    assert s11.session_start == "2024-01-01 10:00:00.000000"
    assert s11.session_end == "2024-01-01 10:10:00.000000"
    s12 = out[(1, 2)]
    assert s12.n_events == 1 and s12.sum_value_cents == 1000
    assert out[(3, 1)].n_events == 2  # 30:00 gap == gap_seconds: same


def test_asof_join_semantics(spark):
    from motive_spark.datapipe import asof_join

    left = spark.createDataFrame(
        [
            (100, 1, _ts(10)),   # matches click at 10:05
            (101, 1, _ts(3)),    # before any click -> NULL
            (102, 1, _ts(5)),    # EXACTLY at click ts -> matches it
            (103, 2, _ts(20)),   # user 2 has no clicks -> NULL
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 7),
            (1, _ts(9), 8),
            (1, _ts(11), 9),  # after every left ts except none
        ],
        "user_id long, ts timestamp_ntz, click_id long",
    )
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, key="user_id", right_cols=["click_id"]
        ).collect()
    }
    assert out[100].asof_click_id == 8  # latest at-or-before 10:10
    assert out[100].asof_lag_us == 60 * 1_000_000
    assert out[101].asof_click_id is None and out[101].asof_lag_us is None
    assert out[102].asof_click_id == 7 and out[102].asof_lag_us == 0
    assert out[103].asof_click_id is None

    # tolerance: the 10:10 purchase is 60s after the 10:09 click; a 30s
    # tolerance drops the match
    tol = {
        r.event_id: r
        for r in asof_join(
            left, right, key="user_id", right_cols=["click_id"],
            tolerance_seconds=30,
        ).collect()
    }
    assert tol[100].asof_click_id is None
    assert tol[102].asof_click_id == 7  # lag 0 still inside tolerance


def test_stream_windowed_event_counts_matches_batch(spark, tmp_path):
    from motive_spark.streaming import stream_windowed_event_counts

    rows = [
        (0, dt.datetime(2024, 1, 1, 10, 5), 1, "view", 1.00, "{}"),
        (1, dt.datetime(2024, 1, 1, 10, 55), 1, "view", 2.00, "{}"),
        (2, dt.datetime(2024, 1, 1, 11, 5), 2, "view", 4.00, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    src = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(src)
    got = {
        r.window_start: (r.n_events, r.sum_value_cents)
        for r in stream_windowed_event_counts(spark, src).collect()
    }
    assert got == {
        "2024-01-01 10:00:00": (2, 300),
        "2024-01-01 11:00:00": (1, 400),
    }


def test_funnel_semantics(spark):
    """Hand-computed ordered funnel: strict ordering, horizon from
    step-1 time, -1 for unreached steps, users without step 1 absent."""
    from motive_spark.datapipe import funnel

    rows = [
        # u1 completes all 3 in order
        (1, _ts(0), "view"),
        (1, _ts(1), "click"),
        (1, _ts(2), "purchase"),
        # u2: click BEFORE view -> click doesn't count; later click ok
        (2, _ts(0), "click"),
        (2, _ts(1), "view"),
        (2, _ts(5), "click"),
        # u3: purchase outside the horizon
        (3, _ts(0), "view"),
        (3, _ts(1), "click"),
        (3, _ts(59), "purchase"),
        # u4: never views -> absent
        (4, _ts(0), "click"),
        (4, _ts(1), "purchase"),
        # u5: purchase before click -> step3 never fires after step2
        (5, _ts(0), "view"),
        (5, _ts(1), "purchase"),
        (5, _ts(2), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    horizon = 30 * 60 * 1_000_000  # 30 minutes
    out = {
        r["user"]: r
        for r in funnel(
            ev, ["view", "click", "purchase"], horizon
        ).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["n_steps"] == 3
    assert out[2]["n_steps"] == 2  # pre-view click ignored, 10:05 click used
    assert out[2]["t2_us"] == int(_ts(5).timestamp() * 1e6) or out[2][
        "t2_us"
    ] > out[2]["t1_us"]
    assert out[3]["n_steps"] == 2 and out[3]["t3_us"] == -1  # horizon miss
    assert out[5]["n_steps"] == 2 and out[5]["t3_us"] == -1  # order miss


def test_approx_distinct_accuracy(spark):
    """Raw-HLL estimate within ~3 rse (18% * 3) of truth on two groups
    of very different cardinality, and invariant to duplication."""
    from motive_spark.datapipe import approx_distinct

    rows = [("a", i % 500) for i in range(5000)] + [
        ("b", i % 37) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r["g"]: r for r in approx_distinct(df, ["k"], ["g"]).collect()}
    assert abs(out["a"]["approx_distinct"] - 500) / 500 < 0.55
    assert abs(out["b"]["approx_distinct"] - 37) / 37 < 0.55
    # duplication invariance: the sketch is a pure function of the SET
    df2 = df.union(df).union(df)
    out2 = {
        r["g"]: r for r in approx_distinct(df2, ["k"], ["g"]).collect()
    }
    assert out2["a"]["s_int"] == out["a"]["s_int"]
    assert out2["b"]["s_int"] == out["b"]["s_int"]


def test_random_projection_jl(spark):
    """Sign projection: exact integer determinism across repartition,
    and the JL property that projected dot products correlate with
    input dot products over random unit vectors."""
    import numpy as np

    from motive_spark.datapipe import random_projection

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = random_projection(emb, 16).toPandas()
    assert len(out) == 40 * 16
    # determinism across physical layout
    out2 = random_projection(emb.repartition(7), 16).toPandas()
    a = out.sort_values(["vec_id", "j"]).reset_index(drop=True)
    b = out2.sort_values(["vec_id", "j"]).reset_index(drop=True)
    assert (a["y_q"] == b["y_q"]).all()
    # JL correlation: projected cosine tracks true cosine
    proj = np.zeros((40, 16))
    for r in out.itertuples():
        proj[int(r.vec_id), int(r.j)] = r.y_q
    pn = proj / np.linalg.norm(proj, axis=1, keepdims=True)
    true_cos = (vecs @ vecs.T)[np.triu_indices(40, 1)]
    proj_cos = (pn @ pn.T)[np.triu_indices(40, 1)]
    assert np.corrcoef(true_cos, proj_cos)[0, 1] > 0.4


def test_retention_cohorts_semantics(spark):
    """Hand-computed weekly retention: cohort by first-active period,
    one count per active period, offset-0 equals cohort size."""
    from motive_spark.datapipe import retention_cohorts

    P = 1_000_000  # 1-second periods for the fixture
    rows = [
        # u1 cohort p0, active p0,p1,p3 (p1 twice -> counted once)
        (1, _ts(0, 0)), (1, _ts(0, 1)), (1, _ts(0, 1, 5)), (1, _ts(0, 3)),
        # u2 cohort p0, active p0 only
        (2, _ts(0, 0, 999)),
        # u3 cohort p1, active p1,p3
        (3, _ts(0, 1)), (3, _ts(0, 3)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["cohort_period"] % 1000, r["offset_periods"]): r["n_users"]
        for r in retention_cohorts(ev, P).collect()
    }
    base = dt.datetime(2024, 1, 1, 10, 0).timestamp()
    p0 = int(base) % 1000
    assert out == {
        (p0, 0): 2, (p0, 1): 1, (p0, 3): 1,
        ((p0 + 1) % 1000, 0): 1, ((p0 + 1) % 1000, 2): 1,
    }


def test_rolling_window_stats_semantics(spark):
    """Trailing range window: inclusive bounds, tie rows share one
    frame, per-user isolation, exact cents."""
    from motive_spark.datapipe import rolling_window_stats

    rows = [
        (1, 10, _ts(0, 0), 1.00),
        (1, 11, _ts(0, 30), 2.00),   # within 60s of e10
        (1, 12, _ts(1, 30), 4.00),   # 60s window: includes e11 (exactly 60s)
        (1, 13, _ts(1, 30), 8.00),   # tie with e12 -> same frame
        (2, 20, _ts(0, 10), 0.50),   # other user isolated
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    out = {
        r["event_id"]: (r["n_window"], r["cents_window"])
        for r in rolling_window_stats(ev, 60 * 1_000_000).collect()
    }
    assert out[10] == (1, 100)
    assert out[11] == (2, 300)
    # e12/e13 frame: e11 (exactly 60s back, inclusive) + both tie rows
    assert out[12] == (3, 1400)
    assert out[13] == (3, 1400)
    assert out[20] == (1, 50)


def test_scd2_intervals_semantics(spark):
    """Interval stitching, no-op collapse, null-change handling,
    tie-break determinism — against hand-computed expectations."""
    from pyspark.sql import functions as F

    from motive_spark.datapipe import scd2_intervals

    rows = [
        # key, ts, id, attr
        (1, "2024-01-01 00:00:00", 1, "a"),
        (1, "2024-01-02 00:00:00", 2, "a"),   # no-op -> collapsed
        (1, "2024-01-03 00:00:00", 3, "b"),
        (1, "2024-01-03 00:00:00", 4, "c"),   # same ts: id tie-break
        (2, "2024-01-01 00:00:00", 5, None),  # null initial
        (2, "2024-01-02 00:00:00", 6, "x"),   # null -> x is a change
    ]
    df = spark.createDataFrame(
        rows, "k long, ts string, eid long, attr string"
    ).select("k", F.to_timestamp("ts").alias("ts"), "eid", "attr")
    out = scd2_intervals(
        df, "k", "ts", ["attr"], tiebreak_col="eid"
    ).collect()
    by = {(r.k, r.version): r for r in out}
    assert len(by) == 5
    day = 86_400_000_000
    t0 = 1_704_067_200_000_000  # 2024-01-01 UTC in micros
    r11 = by[(1, 1)]
    assert (r11.attr, r11.valid_from_us, r11.valid_to_us) == (
        "a", t0, t0 + 2 * day)  # collapse skipped the Jan2 no-op
    r12 = by[(1, 2)]
    assert (r12.attr, r12.valid_to_us) == ("b", t0 + 2 * day)
    r13 = by[(1, 3)]
    assert (r13.attr, r13.valid_to_us, r13.is_current) == ("c", None, True)
    assert by[(2, 1)].attr is None and by[(2, 2)].attr == "x"
    # exactly one current row per key
    cur = [r for r in out if r.is_current]
    assert sorted(r.k for r in cur) == [1, 2]
