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
