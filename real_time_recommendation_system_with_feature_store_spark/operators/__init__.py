from real_time_recommendation_system_with_feature_store_spark.operators.asof import asof_join
from real_time_recommendation_system_with_feature_store_spark.operators.dedup import (
    connected_components,
    cross_corpus_overlap,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from real_time_recommendation_system_with_feature_store_spark.operators.encode import label_encode, minmax_scale, zscore_scale
from real_time_recommendation_system_with_feature_store_spark.operators.kcore import kcore_filter
from real_time_recommendation_system_with_feature_store_spark.operators.knn import (
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
    lsh_near_dup_pairs,
    lsh_topk,
)
from real_time_recommendation_system_with_feature_store_spark.operators.packing import pack_by_token_budget
from real_time_recommendation_system_with_feature_store_spark.operators.rank import global_row_number
from real_time_recommendation_system_with_feature_store_spark.operators.sampling import hash_sample, negative_sample
from real_time_recommendation_system_with_feature_store_spark.operators.sessionize import sessionize
from real_time_recommendation_system_with_feature_store_spark.operators.split import leave_one_out_split, time_fraction_split
from real_time_recommendation_system_with_feature_store_spark.operators.topk import global_topn, topk_per_key

from real_time_recommendation_system_with_feature_store_spark.operators.bpe import bpe_encode, bpe_train, word_vocab
from real_time_recommendation_system_with_feature_store_spark.operators.corpus import (
    char_bigram_lm_scores,
    cluster_keepers,
    grouped_fraction_split,
    mixture_resample,
    scrub_pii,
)

from real_time_recommendation_system_with_feature_store_spark.operators.asof import asof_join_union
from real_time_recommendation_system_with_feature_store_spark.operators.cohort import cohort_retention
from real_time_recommendation_system_with_feature_store_spark.operators.funnel import funnel_stage_times, funnel_summary
from real_time_recommendation_system_with_feature_store_spark.operators.fuse import rrf_fuse
from real_time_recommendation_system_with_feature_store_spark.operators.graph import pagerank, triangle_counts
from real_time_recommendation_system_with_feature_store_spark.operators.merge import latest_changes, merge_changelog
from real_time_recommendation_system_with_feature_store_spark.operators.sketches import (
    bloom_build,
    bloom_might_contain,
    cms_build,
    cms_estimate,
    cms_merge,
    hll_build,
    hll_estimate,
    hll_intersect_estimate,
    hll_merge,
    qsketch_build,
    qsketch_merge,
    qsketch_quantiles,
)
from real_time_recommendation_system_with_feature_store_spark.operators.scd import (
    scd2_apply_increment,
    scd2_from_changelog,
    snapshot_at,
)

__all__ = [
    "asof_join",
    "connected_components",
    "cross_corpus_overlap",
    "exact_dedup",
    "pack_by_token_budget",
    "minhash_lsh_dedup",
    "ngram_jaccard_pairs",
    "simhash_dedup",
    "label_encode",
    "minmax_scale",
    "zscore_scale",
    "kcore_filter",
    "brute_force_topk",
    "cosine_near_dup_pairs",
    "ivf_topk",
    "lsh_near_dup_pairs",
    "lsh_topk",
    "global_row_number",
    "hash_sample",
    "negative_sample",
    "sessionize",
    "leave_one_out_split",
    "time_fraction_split",
    "global_topn",
    "topk_per_key",
    "asof_join_union",
    "bpe_encode",
    "bpe_train",
    "word_vocab",
    "char_bigram_lm_scores",
    "cluster_keepers",
    "grouped_fraction_split",
    "mixture_resample",
    "scrub_pii",
    "scd2_from_changelog",
    "scd2_apply_increment",
    "snapshot_at",
    "pagerank",
    "triangle_counts",
    "latest_changes",
    "merge_changelog",
    "bloom_build",
    "bloom_might_contain",
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "hll_build",
    "hll_estimate",
    "hll_intersect_estimate",
    "hll_merge",
    "qsketch_build",
    "qsketch_merge",
    "qsketch_quantiles",
    "rrf_fuse",
    "cohort_retention",
    "funnel_stage_times",
    "funnel_summary",
]
