"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` over
the payload bytes.  ``decode_image`` is a REAL pure-numpy decoder for
the uncompressed public formats (binary PPM ``P6`` / PGM ``P5``, and
24-bit uncompressed BMP) — no imaging library needed — so
``resize_payload`` and ``image_stats_features`` operate on actual
pixels whenever the payload is one of those formats and fall back to
deterministic byte-level transforms otherwise.  Compressed formats
(JPEG/PNG/video) would slot into the same mapInPandas batch contract
with PIL/cv2 on a cluster that has them; the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is identical
and fully exercised here.
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


def _read_ppm_header(buf: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a binary PPM/PGM header (magic, whitespace- and
    #-comment-separated width/height/maxval, one whitespace, raster).
    Returns (magic, width, height, maxval, raster_offset)."""
    magic = buf[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = fields
    return magic, w, h, maxval, pos


def decode_image(payload_bytes: bytes) -> np.ndarray:
    """Pure-numpy decode of uncompressed public image formats:

    * ``P6`` binary PPM  -> (H, W, 3) uint8
    * ``P5`` binary PGM  -> (H, W) uint8
    * ``BM`` 24-bit uncompressed BMP -> (H, W, 3) uint8 (RGB order,
      top-down rows; BMP stores BGR bottom-up with 4-byte row padding)

    Raises ValueError for anything else (compressed formats need an
    imaging library; callers treat undecodable payloads as opaque
    bytes and take the byte-level fallback path).
    """
    magic = payload_bytes[:2]
    if magic in (b"P6", b"P5"):
        _, w, h, maxval, off = _read_ppm_header(payload_bytes)
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        ch = 3 if magic == b"P6" else 1
        raster = np.frombuffer(payload_bytes, np.uint8, count=w * h * ch, offset=off)
        return raster.reshape((h, w, 3) if ch == 3 else (h, w)).copy()
    if magic == b"BM":
        off = int.from_bytes(payload_bytes[10:14], "little")
        w = int.from_bytes(payload_bytes[18:22], "little", signed=True)
        h = int.from_bytes(payload_bytes[22:26], "little", signed=True)
        bpp = int.from_bytes(payload_bytes[28:30], "little")
        comp = int.from_bytes(payload_bytes[30:34], "little")
        if bpp != 24 or comp != 0:
            raise ValueError(f"only 24-bit uncompressed BMP (bpp={bpp})")
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload_bytes, np.uint8, count=stride * abs(h), offset=off
        ).reshape(abs(h), stride)[:, : w * 3]
        img = rows.reshape(abs(h), w, 3)[:, :, ::-1]  # BGR -> RGB
        if h > 0:  # positive height = bottom-up row order
            img = img[::-1]
        return img.copy()
    raise ValueError(f"undecodable payload (magic {magic!r})")


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> binary PPM ``P6`` / PGM ``P5``."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (H,W,3) or (H,W), got {a.shape}")
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up BGR
    with 4-byte row padding — the canonical on-disk layout)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H,W,3), got {a.shape}")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    raster = rows.tobytes()
    header = (
        b"BM"
        + (54 + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 DPI
        + (0).to_bytes(4, "little") * 2
    )
    return header + raster


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
    """Image resize over mapInPandas: (doc_id, payload, meta) →
    (doc_id, payload, meta) with the payload transformed batch-wise and
    the metadata updated to the new size.

    Decodable payloads (PPM/PGM/BMP) are REALLY resized: decode →
    nearest-neighbor subsample ``img[::factor, ::factor]`` → re-encode
    as PPM/PGM.  Opaque payloads take the deterministic byte-stride
    fallback (same schema/batch contract).  On a cluster with imaging
    libraries, JPEG/PNG decode slots into the same body.
    """
    schema = (
        "doc_id long, payload binary, "
        "meta struct<format:string, n_bytes:long>"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for buf, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    img = decode_image(bytes(buf))
                    b = encode_ppm(img[::factor, ::factor])
                    tag = f"image/ppm;resized/{factor}"
                except ValueError:
                    b = np.frombuffer(buf, dtype=np.uint8)[::factor].tobytes()
                    tag = meta["format"] + f";resized/{factor}"
                out_payload.append(b)
                out_meta.append({"format": tag, "n_bytes": len(b)})
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": out_payload,
                 "meta": out_meta}
            )

    return table.select("doc_id", "payload", "meta").mapInPandas(
        resize, schema=schema
    )


def attach_image_payload(docs: DataFrame, width: int = 24, height: int = 16) -> DataFrame:
    """Deterministic synthetic IMAGE table: every doc gets a real PPM
    payload whose pixels derive from doc_id (a seeded gradient+stripe
    pattern), so decode/resize/featurize pipelines run on genuine
    raster data with no external image corpus.  Generated executor-side
    in Arrow batches — the generator never touches the driver."""
    schema = (
        "doc_id long, payload binary, "
        "meta struct<format:string, n_bytes:long>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:height, 0:width]
        for pdf in batches:
            payloads, metas = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                img = np.stack(
                    [
                        (xx * 11 + d) % 256,
                        (yy * 17 + 3 * d) % 256,
                        ((xx + yy) * 7 + 5 * d) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                b = encode_ppm(img)
                payloads.append(b)
                metas.append({"format": "image/ppm", "n_bytes": len(b)})
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id").mapInPandas(gen, schema=schema)


def image_stats_features(table: DataFrame) -> DataFrame:
    """(doc_id, width, height, features: array<float>) — REAL pixel
    features for decodable payloads: per-channel mean and std (6) plus
    a normalized 8-bin luminance histogram (8) = 14 dims.  Undecodable
    payloads yield NULL width/height and NULL features, so a mixed
    corpus filters with ``features IS NOT NULL``."""
    schema = (
        "doc_id long, width int, height int, features array<float>"
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, feats = [], [], []
            for buf in pdf["payload"]:
                try:
                    img = decode_image(bytes(buf))
                except ValueError:
                    ws.append(None)
                    hs.append(None)
                    feats.append(None)
                    continue
                if img.ndim == 2:
                    img = np.stack([img] * 3, axis=-1)
                h, w = img.shape[:2]
                chan = img.reshape(-1, 3).astype(np.float64)
                lum = chan.mean(axis=1)
                hist = np.histogram(lum, bins=8, range=(0, 256))[0].astype(
                    np.float64
                )
                f = np.concatenate(
                    [chan.mean(axis=0), chan.std(axis=0), hist / hist.sum()]
                )
                ws.append(w)
                hs.append(h)
                feats.append(f.astype(np.float32).tolist())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": ws, "height": hs,
                 "features": feats}
            )

    return table.select("doc_id", "payload").mapInPandas(featurize, schema=schema)
