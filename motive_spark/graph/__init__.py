from motive_spark.graph.gml import read_gml, write_gml
from motive_spark.graph.normalize import (
    degrees,
    normalize_ids,
    simplify,
    undirect,
    vertices,
)

__all__ = [
    "normalize_ids",
    "simplify",
    "degrees",
    "undirect",
    "vertices",
    "read_gml",
    "write_gml",
]
