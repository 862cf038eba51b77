from motive_spark.graph.normalize import (
    degrees,
    normalize_ids,
    simplify,
    undirect,
    vertices,
)

__all__ = ["normalize_ids", "simplify", "degrees", "undirect", "vertices"]
