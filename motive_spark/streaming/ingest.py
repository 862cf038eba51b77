"""Structured Streaming ingestion for the edge table.

The reference is batch-only; at 100-TB scale the edge table is APPENDED
continuously (new commits land in the code table, new import edges
appear), so the Spark-native engine ingests edges as a stream:

* ``stream_edges`` — ``readStream`` over a directory of edge files
  (JSON lines or Parquet), schema-enforced.  One micro-batch per
  trigger; ``availableNow`` drains a backlog exactly once (tests and
  backfills use it).
* ``windowed_edge_counts`` — event-time tumbling-window edge counts
  with a WATERMARK: late rows inside the watermark still land in their
  window; older ones are dropped and the window state is garbage
  collected (bounded state — the requirement for an unbounded stream).
* ``running_degrees_stream`` — custom stateful operator via
  ``applyInPandasWithState``: per-vertex running out-degree maintained
  in group state across micro-batches, emitting the updated degree per
  touched vertex each batch (the streaming analogue of
  graph.normalize.degrees).

All sinks write Parquet + checkpoint dir, so a killed stream resumes
exactly-once from its offsets — the same resume contract the batch
kernels honor per-superstep (checkpoint.CheckpointManager).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


def stream_edges(
    spark: SparkSession, input_dir: str, fmt: str = "json"
) -> DataFrame:
    """Streaming edge source: (src, dst, event_time) rows from files
    appearing under ``input_dir``."""
    reader = spark.readStream.schema(EDGE_SCHEMA)
    if fmt == "json":
        return reader.json(input_dir)
    if fmt == "parquet":
        return reader.parquet(input_dir)
    raise ValueError(f"unsupported stream format: {fmt}")


def windowed_edge_counts(
    edges: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling event-time windows of edge arrivals, watermark-bounded.

    Returns (window_start, window_end, n_edges, n_src) in append mode —
    a window emits once its watermark passes, so downstream sinks see
    each window exactly once.
    """
    return (
        edges.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.approx_count_distinct("src").alias("n_src"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_edges",
            "n_src",
        )
    )


def running_degrees_stream(edges: DataFrame) -> DataFrame:
    """Per-vertex running out-degree via ``applyInPandasWithState``.

    Emits (id, out_deg) for every vertex touched in each micro-batch,
    with the cumulative degree held in group state — bounded by one
    long per live vertex, partitioned by vertex hash like every batch
    kernel's state table.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
        if state.exists:
            (total,) = state.get
        else:
            total = 0
        total += n_new
        state.update((total,))
        yield pd.DataFrame({"id": [key[0]], "out_deg": [total]})

    return (
        edges.select(F.col("src").alias("id"))
        .groupBy("id")
        .applyInPandasWithState(
            update,
            outputStructType="id long, out_deg long",
            stateStructType="total long",
            # append: each micro-batch's emitted rows append to the sink
            # (the Parquet file sink supports only append; the state
            # itself still updates across batches)
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_DRAIN_ROOT: str | None = None


def _drain_root() -> str:
    """One managed temp root per process for every drain/stream-source
    scratch dir (instead of mkdtemp litter all over the temp dir); the
    whole tree is removed at interpreter exit."""
    global _DRAIN_ROOT
    if _DRAIN_ROOT is None:
        import atexit
        import shutil
        import tempfile

        _DRAIN_ROOT = tempfile.mkdtemp(prefix="motive_spark_streams_")
        atexit.register(shutil.rmtree, _DRAIN_ROOT, True)
    return _DRAIN_ROOT


def _as_stream_dir(input_path: str) -> str:
    """The file stream source requires a DIRECTORY basePath; expose a
    single-file input through a symlinked temp dir (no data copy)."""
    import os
    import tempfile

    if not os.path.isfile(input_path):
        return input_path
    d = tempfile.mkdtemp(prefix="src_", dir=_drain_root())
    os.symlink(
        os.path.abspath(input_path),
        os.path.join(d, os.path.basename(input_path)),
    )
    return d


def _drain_complete_to_parquet(agg: DataFrame) -> DataFrame:
    """Run a complete-mode streaming aggregation to end-of-backlog
    (availableNow) through a foreachBatch parquet sink and return the
    final static table — the exactly-once batch-drain shape shared by
    the streaming contract rows.

    The sink dir is seeded with an EMPTY frame of the aggregation's
    schema before the stream starts, so a source that yields zero
    micro-batches returns an empty result instead of an unrelated
    'unable to infer schema' read failure; the checkpoint dir is
    removed once the drain finishes (the out dir lives until process
    exit — the returned DataFrame reads from it lazily)."""
    import shutil
    import tempfile

    spark = agg.sparkSession
    out_dir = tempfile.mkdtemp(prefix="out_", dir=_drain_root())
    ckpt = tempfile.mkdtemp(prefix="ckpt_", dir=_drain_root())
    spark.createDataFrame([], agg.schema).write.mode("overwrite").parquet(
        out_dir
    )

    def write_batch(bdf: DataFrame, epoch_id: int) -> None:
        # complete mode: each epoch carries the full state; the last
        # overwrite is the final table
        bdf.write.mode("overwrite").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(out_dir)


def stream_static_enriched_counts(
    spark: SparkSession,
    events_path: str,
    dim: DataFrame,
    dim_key: str = "c_custkey",
    stream_key: str = "user_id",
) -> DataFrame:
    """Stream-static join enrichment, drained exactly-once: a streaming
    event source joined per micro-batch against a STATIC broadcast
    dimension table (the standard enrichment topology — the static side
    is re-read per batch by Spark, no state), then a complete-mode
    aggregation per (c_mktsegment, event_type).

    Returns (c_mktsegment, event_type, n_events, sum_value_cents,
    first_event_id) — deterministic regardless of micro-batch slicing
    (the aggregation commutes with batch order), so a DuckDB oracle
    replays it as a plain JOIN + GROUP BY.  Value sums are integer
    cents (cross-engine exact).  At scale the broadcast holds for
    dimension tables that fit an executor (customers, vocabularies);
    bigger dims shuffle-join each micro-batch instead (drop the
    broadcast hint)."""
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(
        _as_stream_dir(events_path)
    )
    d = dim.select(
        F.col(dim_key).alias(stream_key),
        "c_mktsegment",
    )
    enriched = stream.join(F.broadcast(d), on=stream_key, how="left")
    agg = enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "sum_value_cents"
        ),
        F.min("event_id").alias("first_event_id"),
    )
    return _drain_complete_to_parquet(agg)


def stream_windowed_event_counts(
    spark: SparkSession,
    input_path: str,
    window: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling-window counts over a parquet-backed event
    stream, drained exactly-once: readStream over (event_id, ts, ...,
    value) rows, stateful windowed aggregation, availableNow trigger,
    foreachBatch parquet sink.

    Returns (window_start, window_end, n_events, sum_value_cents) with
    the window bounds as formatted strings and the value sum in integer
    cents — deterministic regardless of batch arrival order, so the
    DuckDB oracle replays it as a date_trunc GROUP BY.  (The unbounded
    -stream variant with WATERMARKED state is ``windowed_edge_counts``;
    this is the batch-drain/backfill shape.)
    """
    schema = spark.read.parquet(input_path).schema
    stream = spark.readStream.schema(schema).parquet(
        _as_stream_dir(input_path)
    )
    agg = stream.groupBy(F.window("ts", window).alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "sum_value_cents"
        ),
    )
    out = _drain_complete_to_parquet(
        agg.select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "n_events",
            "sum_value_cents",
        )
    )
    return out


def stream_prefix_dedup_groups(
    spark: SparkSession,
    input_path: str,
    n_prefix_tokens: int = 3,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming prefix-fingerprint dedup GROUPS, drained exactly-once.

    readStream over a parquet path of (doc_id, text, ...) docs; the
    dedup key is md5 of the first ``n_prefix_tokens`` whitespace tokens
    (the prefix-fingerprint trick pretraining pipelines use for
    boilerplate families); a stateful complete-mode aggregation keeps
    (n_docs, keeper = min doc_id) per key across micro-batches, an
    ``availableNow`` trigger drains the backlog exactly once, and
    foreachBatch overwrites a parquet sink with the final state.
    Returns the finished static DataFrame
    (content_key, n_docs, keeper_doc_id) — deterministic regardless of
    file/batch arrival order, so the DuckDB oracle replays it as a
    plain GROUP BY (the streaming tier's cross-engine gate).

    State is bounded by #distinct keys; for UNBOUNDED streams the
    watermark-bounded ``stream_dedup_docs`` below is the scale path —
    this runner is the batch-drain/backfill shape.
    """
    schema = spark.read.parquet(input_path).schema
    input_path = _as_stream_dir(input_path)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # forces a multi-micro-batch drain (state correctness across
        # batches is pinned by test_streaming)
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    key = F.md5(
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, n_prefix_tokens))
    )
    agg = stream.groupBy(key.alias("content_key")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("keeper_doc_id"),
    )
    return _drain_complete_to_parquet(agg)


def stream_dedup_docs(
    docs: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication: emit only the FIRST occurrence of
    each text payload across micro-batches.

    ``docs``: streaming (doc_id, text, event_time).  State = one row per
    distinct md5 inside the watermark horizon
    (dropDuplicatesWithinWatermark), so state stays bounded on an
    unbounded stream — the streaming twin of datapipe's exact dedup.
    """
    keyed = docs.select(
        "doc_id", "text", "event_time", F.md5("text").alias("text_md5")
    )
    return keyed.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["text_md5"]
    )


def stream_late_data_windowed_counts(
    spark: SparkSession,
    events_path: str,
    split_date: str,
    window: str = "1 day",
    delay: str = "72 hours",
) -> DataFrame:
    """Watermark LATE-DATA semantics, made deterministic and
    oracle-replayable: an append-mode windowed aggregation drained
    through three ordered micro-batches —

      batch 0: on-time events before ``split_date`` (even event_id),
      batch 1: on-time events from ``split_date`` on (even event_id),
      batch 2: a late BACKFILL (all odd-event_id events, any age).

    The file source is pinned to one file per trigger with ascending
    mtimes, so the batch sequence — and therefore every watermark
    update — is a pure function of the input.  Measured Spark
    semantics (pinned by test_streaming's hand fixture):

      * a late row whose window is STILL IN STATE merges into it, even
        when the row's event time is far behind the watermark;
      * a row whose window was already evicted is DROPPED — for the
        backfill batch that means windows ending at or before
        ``max ts(batch 0) − delay``;
      * append mode finally emits exactly the windows ending at or
        before ``max ts(all) − delay`` (inclusive); newer windows stay
        in state, withheld.

    So the result shows all three regimes side by side: old windows
    with on-time-only counts (backfill dropped), middle windows with
    merged counts, and the withheld tail absent.  Returns
    (window_start, n_events, sum_value_cents), exactly-once via
    foreachBatch parquet appends of finalized windows.
    """
    import os
    import shutil
    import tempfile

    ev = spark.read.parquet(events_path)
    even = F.pmod(F.col("event_id"), F.lit(2)) == 0
    before = F.date_format("ts", "yyyy-MM-dd") < split_date
    batches = [
        ev.where(even & before),
        ev.where(even & ~before),
        ev.where(~even),
    ]
    src = tempfile.mkdtemp(prefix="late_src_", dir=_drain_root())
    for i, b in enumerate(batches):
        d = tempfile.mkdtemp(prefix="late_w_", dir=_drain_root())
        b.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{i:03d}.parquet")
        shutil.copy(os.path.join(d, part), dst)
        os.utime(dst, (1_000_000 + i * 1000, 1_000_000 + i * 1000))
        shutil.rmtree(d, ignore_errors=True)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # watermarks require TIMESTAMP (not NTZ); the session tz is pinned
    # to UTC (session.py), so the cast preserves the wall-clock value
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "sum_value_cents"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("window_start"),
            "n_events",
            "sum_value_cents",
        )
    )
    out_dir = tempfile.mkdtemp(prefix="late_out_", dir=_drain_root())
    ckpt = tempfile.mkdtemp(prefix="late_ckpt_", dir=_drain_root())
    spark.createDataFrame([], agg.schema).write.mode("overwrite").parquet(
        out_dir
    )

    def write_batch(bdf: DataFrame, epoch_id: int) -> None:
        # append mode: each epoch carries only newly-FINALIZED windows
        bdf.write.mode("append").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(out_dir)


def stream_stream_join_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "30 minutes",
) -> DataFrame:
    """STREAM-STREAM inner join, drained exactly-once: the even-id and
    odd-id halves of the event table arrive as two independent
    watermarked streams and join on user within ±``window`` event
    time.  Each side is staged as ONE file, so the drain is a single
    micro-batch per side: every pair meets its partner before any
    watermark eviction can run, and the drained result equals the
    static time-conditioned join — the DuckDB-replayable gate for the
    stateful dual-stream operator.  (Across MULTIPLE batches an inner
    time-bounded join is still exactly-once for pairs within the
    watermark, but rows arriving later than the 10-minute watermark
    could lose matches to state cleanup — the unbounded-stream
    trade-off, same as the late-data contract documents.)

    Returns (user_id, n_pairs, sum_value_cents) where sum is over the
    even-side value of each matched pair.
    """
    import os
    import shutil
    import tempfile

    ev = spark.read.parquet(events_path)
    src_a = tempfile.mkdtemp(prefix="ssj_a_", dir=_drain_root())
    src_b = tempfile.mkdtemp(prefix="ssj_b_", dir=_drain_root())
    for src, half in (
        (src_a, ev.where(F.pmod("event_id", F.lit(2)) == 0)),
        (src_b, ev.where(F.pmod("event_id", F.lit(2)) == 1)),
    ):
        d = tempfile.mkdtemp(prefix="ssj_w_", dir=_drain_root())
        half.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        shutil.copy(os.path.join(d, part), os.path.join(src, "000.parquet"))
        shutil.rmtree(d, ignore_errors=True)

    def side(path, tag):
        s = spark.readStream.schema(ev.schema).parquet(path)
        return s.select(
            F.col("user_id").alias(f"{tag}_user"),
            F.col("event_id").alias(f"{tag}_id"),
            F.col("ts").cast("timestamp").alias(f"{tag}_ts"),
            F.round(F.col("value") * 100).cast("long").alias(f"{tag}_cents"),
        ).withWatermark(f"{tag}_ts", "10 minutes")

    a, b = side(src_a, "a"), side(src_b, "b")
    joined = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.expr(f"a_ts - INTERVAL {window}"))
        & (F.col("b_ts") <= F.expr(f"a_ts + INTERVAL {window}")),
        "inner",
    )
    out_dir = tempfile.mkdtemp(prefix="ssj_out_", dir=_drain_root())
    ckpt = tempfile.mkdtemp(prefix="ssj_ckpt_", dir=_drain_root())
    partial_schema = "a_user long, n_pairs long, sum_value_cents long"
    spark.createDataFrame([], partial_schema).write.mode("overwrite").parquet(
        out_dir
    )

    def write_batch(bdf: DataFrame, epoch_id: int) -> None:
        # aggregate BEFORE the sink (guide §2.3): each epoch appends
        # per-user partial (count, sum) rows instead of every raw
        # matched pair — count/sum are decomposable, so summing the
        # partials below is bit-identical to aggregating raw pairs,
        # and the exactly-once foreachBatch contract is unchanged
        (
            bdf.groupBy("a_user")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("a_cents").alias("sum_value_cents"),
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.read.parquet(out_dir)
        .groupBy(F.col("a_user").alias("user_id"))
        .agg(
            F.sum("n_pairs").alias("n_pairs"),
            F.sum("sum_value_cents").alias("sum_value_cents"),
        )
    )
