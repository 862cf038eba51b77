"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` over
the payload bytes.  The decode step itself is STUBBED in this container
(no image/audio libraries): ``decode_image`` raises NotImplementedError
behind a clearly-marked gate, while ``byte_histogram_features`` is a
deterministic fake featurizer that exercises the REAL Spark plumbing —
schema, partitioning, UDF signature, Arrow batch shapes — end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 32


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal table: text encoded to a binary payload plus
    typed metadata (format, n_bytes).  At production scale this column
    comes straight from the lakehouse (e.g. image bytes in Iceberg)."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain;fake").alias("format"),
            F.length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload_bytes: bytes):  # pragma: no cover - stub
    """STUB: real image decode requires PIL/opencv, absent here.

    The Spark-side plumbing that WOULD call this is fully wired (see
    byte_histogram_features); swap this function for a real decoder on a
    cluster with the imaging libraries installed.
    """
    raise NotImplementedError(
        "image decode is stubbed in this environment (no imaging libs); "
        "use byte_histogram_features for the deterministic fake path"
    )


def byte_histogram_features(table: DataFrame, batch_limit: int = 10_000) -> DataFrame:
    """(doc_id, features: array<float>) — deterministic fake featurizer:
    a normalized 32-bin byte histogram of the payload.

    mapInPandas keeps the whole batch in Arrow; the per-batch numpy is
    vectorized (bincount over a concatenated byte buffer with offsets).
    """
    schema = "doc_id long, features array<float>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                arr = np.frombuffer(buf, dtype=np.uint8)
                hist = np.bincount(arr >> 3, minlength=FEATURE_DIM).astype(np.float32)
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return table.select("doc_id", "payload").mapInPandas(featurize, schema=schema)


def frame_sample_plan(table: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling plan: one row per (doc_id, frame_idx)
    for frames 0, n, 2n, ... bounded by meta.n_bytes/1024 fake 'frames'.
    Pure expression plumbing (sequence+explode) — the real decoder would
    read only these offsets."""
    n_frames = F.greatest((F.col("meta.n_bytes") / 1024).cast("int"), F.lit(1))
    return table.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_payload(table: DataFrame, factor: int = 4) -> DataFrame:
    """Image-resize PLUMBING over mapInPandas: (doc_id, payload, meta) →
    (doc_id, payload, meta) with the payload transformed batch-wise and
    the metadata updated to the new size.

    The transform body is a deterministic stand-in (stride-subsample the
    byte buffer by ``factor`` — the container has no imaging libraries);
    on a real cluster the body becomes decode → PIL/cv2 resize →
    re-encode, with the SAME Arrow batch shape, schema and metadata
    contract exercised here.
    """
    schema = (
        "doc_id long, payload binary, "
        "meta struct<format:string, n_bytes:long>"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for buf, meta in zip(pdf["payload"], pdf["meta"]):
                arr = np.frombuffer(buf, dtype=np.uint8)[::factor]
                b = arr.tobytes()
                out_payload.append(b)
                out_meta.append(
                    {"format": meta["format"] + f";resized/{factor}",
                     "n_bytes": len(b)}
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": out_payload,
                 "meta": out_meta}
            )

    return table.select("doc_id", "payload", "meta").mapInPandas(
        resize, schema=schema
    )
