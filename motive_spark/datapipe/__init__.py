from motive_spark.datapipe.dedup import (
    dedup_clusters,
    incremental_dedup,
    multi_signal_dedup,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from motive_spark.datapipe.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    ivf_topk,
    kmeans_clusters,
    lsh_bucketed_topk,
)
from motive_spark.datapipe.multimodal import (
    attach_binary_payload,
    attach_image_payload,
    byte_histogram_features,
    decode_image,
    encode_bmp,
    encode_ppm,
    frame_sample_plan,
    image_stats_features,
    resize_payload,
)
from motive_spark.datapipe.stats import (
    approx_percentiles_binned,
    group_percentiles,
)
from motive_spark.datapipe.cardinality import (
    approx_distinct,
    random_projection,
)
from motive_spark.datapipe.temporal import (
    asof_join,
    funnel,
    retention_cohorts,
    rolling_window_stats,
    scd2_intervals,
    sessionize,
)
from motive_spark.datapipe.assoc import association_rules
from motive_spark.datapipe.cardinality import (
    kmv_distinct,
    kmv_set_ops,
    kmv_sketch,
)
from motive_spark.datapipe.linkage import blocked_link_pairs
from motive_spark.datapipe.skew import (
    bloom_bits,
    bloom_semi_join,
    salted_join,
    top_keys_by_count,
)
from motive_spark.datapipe.sketch import (
    countmin_estimate,
    countmin_sketch,
    heavy_hitters_cms,
)
from motive_spark.datapipe.sampling import (
    hash_sample,
    stratified_topn,
    weighted_sample_topn,
)
from motive_spark.datapipe.text import (
    bm25_topk,
    collocations_pmi,
    detect_language,
    detect_language_ngram,
    document_fingerprint,
    gopher_quality_filter,
    ngram_contamination,
    quality_scores,
    redact_pii,
    tfidf_similar_docs,
    token_stats,
)

__all__ = [
    "exact_duplicates",
    "dedup_clusters",
    "multi_signal_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "ivf_topk",
    "kmeans_clusters",
    "embedding_near_duplicates",
    "token_stats",
    "bm25_topk",
    "tfidf_similar_docs",
    "association_rules",
    "kmv_sketch",
    "kmv_distinct",
    "kmv_set_ops",
    "incremental_dedup",
    "blocked_link_pairs",
    "salted_join",
    "bloom_bits",
    "bloom_semi_join",
    "top_keys_by_count",
    "countmin_sketch",
    "countmin_estimate",
    "heavy_hitters_cms",
    "hash_sample",
    "stratified_topn",
    "weighted_sample_topn",
    "collocations_pmi",
    "ngram_contamination",
    "redact_pii",
    "approx_distinct",
    "random_projection",
    "funnel",
    "retention_cohorts",
    "rolling_window_stats",
    "scd2_intervals",
    "quality_scores",
    "detect_language",
    "detect_language_ngram",
    "gopher_quality_filter",
    "document_fingerprint",
    "attach_binary_payload",
    "attach_image_payload",
    "byte_histogram_features",
    "decode_image",
    "encode_ppm",
    "encode_bmp",
    "image_stats_features",
    "resize_payload",
    "frame_sample_plan",
    "sessionize",
    "approx_percentiles_binned",
    "group_percentiles",
    "asof_join",
]
