"""GML (Graph Modelling Language) source — the reference's `--file.format
gml` path (Run.java:245, flagged "not well tested" there; this reader
covers the same node/edge-block subset).

Spark-first: each file is read WHOLE (``spark.read.text(wholetext)``) and
the node/edge blocks are pulled out with ``regexp_extract_all`` — pure
DataFrame expressions, no driver-side parsing, so a directory of GML
files parses in parallel, one task per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# block bodies may contain ONE level of nested sub-blocks (the common
# `graphics [ ... ]` attribute); a plain [^\]]* would stop at the nested
# closer and silently drop whatever follows it
_BLOCK_BODY = r"((?:[^\[\]]|\[[^\[\]]*\])*)"
_EDGE_BLOCK = r"edge\s*\[" + _BLOCK_BODY + r"\]"
_NODE_BLOCK = r"node\s*\[" + _BLOCK_BODY + r"\]"


def read_gml(spark: SparkSession, path: str) -> dict:
    """Parse GML file(s) at ``path``.

    Returns {"edges": (src, dst), "nodes": (id, label), "directed": bool}.
    ``directed`` is True iff any file declares ``directed 1``.
    """
    raw = spark.read.text(path, wholetext=True).cache()

    edges = (
        raw.select(
            F.explode(F.regexp_extract_all("value", F.lit(_EDGE_BLOCK), 1)).alias(
                "blk"
            )
        )
        .select(
            F.regexp_extract("blk", r"source\s+(-?\d+)", 1).alias("s"),
            F.regexp_extract("blk", r"target\s+(-?\d+)", 1).alias("t"),
        )
        .where((F.col("s") != "") & (F.col("t") != ""))
        .select(
            F.col("s").cast("long").alias("src"), F.col("t").cast("long").alias("dst")
        )
    )
    nodes = (
        raw.select(
            F.explode(F.regexp_extract_all("value", F.lit(_NODE_BLOCK), 1)).alias(
                "blk"
            )
        )
        .select(
            F.regexp_extract("blk", r"id\s+(-?\d+)", 1).alias("i"),
            F.regexp_extract("blk", r'label\s+"([^"]*)"', 1).alias("label"),
        )
        .where(F.col("i") != "")
        .select(F.col("i").cast("long").alias("id"), "label")
    )
    directed = (
        raw.where(F.col("value").rlike(r"directed\s+1")).limit(1).count() > 0
    )
    # materialize the (small) parsed frames BEFORE dropping the whole-text
    # cache — otherwise every downstream action re-reads and re-parses the
    # raw files
    edges = edges.localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)
    raw.unpersist()
    return {"edges": edges, "nodes": nodes, "directed": directed}


def write_gml(edges: DataFrame, path: str, directed: bool = True) -> None:
    """Inverse sink (single file, driver-side — GML is a small-graph
    interchange format; Parquet is the scale path)."""
    rows = edges.select("src", "dst").collect()
    verts = sorted({v for r in rows for v in (r["src"], r["dst"])})
    with open(path, "w") as f:
        f.write("graph [\n")
        if directed:
            f.write("  directed 1\n")
        for v in verts:
            f.write(f"  node [ id {v} ]\n")
        for r in rows:
            f.write(f"  edge [ source {r['src']} target {r['dst']} ]\n")
        f.write("]\n")
