"""Distributed operators: kNN search/join, dedup family, similarity search.

These are the engine's extension surface beyond the reference's
insert/query core (SURVEY.md §2.3, §7.1 step 8) — each one a composition of
built-in DataFrame ops (shuffle-aware, AQE-friendly), with pandas-UDF paths
only where Spark genuinely lacks the primitive (partitioned ANN index build).
"""

from kaer_spark.operators.knn import exact_knn, hard_negatives, knn_join
from kaer_spark.operators.ranking import (
    bigram_lm_fit,
    bigram_lm_scores,
    bm25_scores,
    build_vocab,
    oov_stats,
)
from kaer_spark.operators.sampling import (
    hash_sample,
    quota_per_group,
    pps_systematic_sample,
    pps_systematic_sample_by,
    sampled_quantiles,
    temperature_rates,
    token_budget_mix,
    weighted_mix,
)
from kaer_spark.operators.dedup import (
    cluster_representatives,
    dedup_cluster_stats,
    dedup_clusters,
    dedup_keep_best,
    dedup_representatives,
    duplicate_passages,
    exact_dedup,
    embedding_near_dups,
    minhash_signatures,
    minhash_near_dups,
    ngram_jaccard_pairs,
    passage_overlap_between,
    remove_duplicate_lines,
    remove_repeated_lines,
    remove_duplicate_passages,
    remove_duplicate_passages_against,
    semdedup,
    simhash,
    simhash_near_dups,
)
from kaer_spark.operators.hybrid import rrf_fuse, with_rank
from kaer_spark.operators.multimodal import (
    attach_fake_media,
    image_dhash,
    image_near_dups,
)
from kaer_spark.operators.text_index import (
    build_text_index,
    read_text_index_meta,
    search_text_index,
)
from kaer_spark.operators.similarity import (
    brute_force_topk,
    ivf_knn_join,
    ivf_fit_spread,
    ivf_topk_deterministic,
    lsh_index,
    lsh_topk,
    pq_topk_deterministic,
    signlsh_topk,
)

__all__ = [
    "bigram_lm_fit",
    "bigram_lm_scores",
    "bm25_scores",
    "oov_stats",
    "build_vocab",
    "hash_sample",
    "quota_per_group",
    "pps_systematic_sample",
    "pps_systematic_sample_by",
    "sampled_quantiles",
    "token_budget_mix",
    "temperature_rates",
    "weighted_mix",
    "ivf_knn_join",
    "ivf_fit_spread",
    "ivf_topk_deterministic",
    "pq_topk_deterministic",
    "signlsh_topk",
    "exact_knn",
    "knn_join",
    "hard_negatives",
    "rrf_fuse",
    "attach_fake_media",
    "image_dhash",
    "image_near_dups",
    "with_rank",
    "build_text_index",
    "read_text_index_meta",
    "search_text_index",
    "exact_dedup",
    "cluster_representatives",
    "dedup_clusters",
    "dedup_cluster_stats",
    "dedup_keep_best",
    "dedup_representatives",
    "duplicate_passages",
    "remove_duplicate_lines",
    "remove_repeated_lines",
    "remove_duplicate_passages",
    "remove_duplicate_passages_against",
    "passage_overlap_between",
    "semdedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_near_dups",
    "simhash",
    "simhash_near_dups",
    "embedding_near_dups",
    "brute_force_topk",
    "lsh_index",
    "lsh_topk",
]
