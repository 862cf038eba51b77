from motive_spark.streaming.ingest import (
    running_degrees_stream,
    stream_dedup_docs,
    stream_late_data_windowed_counts,
    stream_stream_join_counts,
    stream_prefix_dedup_groups,
    stream_static_enriched_counts,
    stream_windowed_event_counts,
    stream_edges,
    windowed_edge_counts,
)

__all__ = [
    "stream_edges",
    "windowed_edge_counts",
    "running_degrees_stream",
    "stream_dedup_docs",
    "stream_late_data_windowed_counts",
    "stream_stream_join_counts",
    "stream_prefix_dedup_groups",
    "stream_static_enriched_counts",
    "stream_windowed_event_counts",
]
