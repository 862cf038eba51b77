from motive_spark.graph.features import (
    negative_samples,
    neighbor_feature_agg,
)
from motive_spark.graph.gml import read_gml, write_gml
from motive_spark.graph.temporal import (
    windowed_components,
    windowed_copair_count,
    windowed_edges,
    windowed_graph_metrics,
)
from motive_spark.graph.metrics import (
    degree_assortativity,
    k_hop_neighborhood,
    community_modularity,
    link_prediction_scores,
    link_prediction_topk,
    local_clustering_coefficients,
    node2vec_walks,
    random_walks,
)
from motive_spark.graph.normalize import (
    degrees,
    normalize_ids,
    simplify,
    undirect,
    vertices,
)

__all__ = [
    "windowed_edges",
    "windowed_graph_metrics",
    "windowed_copair_count",
    "windowed_components",
    "normalize_ids",
    "simplify",
    "degrees",
    "undirect",
    "vertices",
    "read_gml",
    "local_clustering_coefficients",
    "degree_assortativity",
    "k_hop_neighborhood",
    "random_walks",
    "node2vec_walks",
    "community_modularity",
    "link_prediction_scores",
    "link_prediction_topk",
    "neighbor_feature_agg",
    "negative_samples",
    "write_gml",
]
