from motive_spark.motifs.canon import canonical_form, canonical_udf
from motive_spark.motifs.extract import MotifExtractor
from motive_spark.motifs.sample import sample_connected_subgraphs

__all__ = [
    "canonical_form",
    "canonical_udf",
    "sample_connected_subgraphs",
    "MotifExtractor",
]
