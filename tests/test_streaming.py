"""Structured Streaming ingestion: file-source micro-batches drained
with availableNow, windowed watermark aggregation, stateful running
degrees across batches, and exactly-once resume via the checkpoint."""

import json
import os
import time

import pytest


def _write_batch(d, name, rows):
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as f:
        for src, dst, ts in rows:
            f.write(
                json.dumps(
                    {"src": src, "dst": dst, "event_time": ts}
                )
                + "\n"
            )
    os.rename(tmp, os.path.join(d, f"{name}.json"))


def _drain(q):
    q.awaitTermination(120)


def test_windowed_edge_counts(spark, tmp_path):
    from motive_spark.streaming import stream_edges, windowed_edge_counts

    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    _write_batch(
        src_dir,
        "b0",
        [
            (1, 2, "2026-01-01T00:00:10"),
            (2, 3, "2026-01-01T00:00:40"),
            (3, 4, "2026-01-01T00:01:10"),
            (4, 5, "2026-01-01T00:05:00"),  # advances the watermark
        ],
    )
    counts = windowed_edge_counts(
        stream_edges(spark, src_dir), window="1 minute", watermark="1 minute"
    )
    q = (
        counts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        r["window_start"].strftime("%H:%M"): r["n_edges"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # windows 00:00 (2 edges) and 00:01 (1 edge) are closed by the
    # watermark once 00:05 arrives; the 00:05 window stays open (append
    # mode emits only finalized windows)
    assert got == {"00:00": 2, "00:01": 1}


def test_running_degrees_state_across_batches(spark, tmp_path):
    from motive_spark.streaming import running_degrees_stream, stream_edges

    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    def run_once():
        q = (
            running_degrees_stream(stream_edges(spark, src_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)

    _write_batch(
        src_dir,
        "b0",
        [(1, 2, "2026-01-01T00:00:00"), (1, 3, "2026-01-01T00:00:01"),
         (2, 3, "2026-01-01T00:00:02")],
    )
    run_once()
    # second batch arrives AFTER the first stream stopped: the restarted
    # query resumes from the checkpoint (exactly-once) and the per-vertex
    # state carries the earlier degrees forward
    _write_batch(
        src_dir,
        "b1",
        [(1, 4, "2026-01-01T00:01:00"), (3, 4, "2026-01-01T00:01:01")],
    )
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    latest = {}
    for r in rows:
        latest[r["id"]] = max(latest.get(r["id"], 0), r["out_deg"])
    assert latest == {1: 3, 2: 1, 3: 1}
