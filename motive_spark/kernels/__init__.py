from motive_spark.kernels.betweenness import betweenness_sampled
from motive_spark.kernels.coloring import greedy_coloring
from motive_spark.kernels.components import connected_components
from motive_spark.kernels.hits import hits
from motive_spark.kernels.hyperball import hyperball
from motive_spark.kernels.kcore import k_core
from motive_spark.kernels.ktruss import k_truss
from motive_spark.kernels.msf import boruvka_msf
from motive_spark.kernels.articulation import articulation_points
from motive_spark.kernels.bridges import bridges
from motive_spark.kernels.louvain import (
    contract_graph,
    louvain_multilevel,
    louvain_refine,
    louvain_refine_weighted,
)
from motive_spark.kernels.labelprop import (
    label_propagation,
    seeded_label_propagation,
)
from motive_spark.kernels.pagerank import (
    grouped_pagerank,
    pagerank,
    personalized_pagerank,
    weighted_pagerank,
)
from motive_spark.kernels.scc import strongly_connected_components
from motive_spark.kernels.sssp import (
    delta_stepping,
    harmonic_centrality,
    shortest_paths,
)
from motive_spark.kernels.triangles import triangle_count, triangles_per_vertex

__all__ = [
    "pagerank",
    "personalized_pagerank",
    "weighted_pagerank",
    "hits",
    "k_core",
    "k_truss",
    "boruvka_msf",
    "connected_components",
    "strongly_connected_components",
    "greedy_coloring",
    "betweenness_sampled",
    "hyperball",
    "shortest_paths",
    "delta_stepping",
    "harmonic_centrality",
    "label_propagation",
    "louvain_refine",
    "grouped_pagerank",
    "contract_graph",
    "louvain_refine_weighted",
    "louvain_multilevel",
    "bridges",
    "articulation_points",
    "seeded_label_propagation",
    "triangle_count",
    "triangles_per_vertex",
]
