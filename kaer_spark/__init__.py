"""kaer_spark — a PySpark-native analytics engine with the capabilities of
sunby/kaer (a vector database on a document store), rebuilt Spark-first and
extended with large-scale LLM-data-pipeline operators.

Reference surface (see SURVEY.md for the full inventory, citations are into
/root/reference):

* ``KaerContext`` — collection DDL (create/get/drop), mirroring
  ``db/kaer.go:28-76``.
* ``Collection`` — insert (embed + dense id assignment + append,
  ``db/db.go:60-100``) and query (metadata-pre-filtered exact kNN,
  ``db/db.go:111-143``).
* ``compile_filter`` — MongoDB/FerretDB-style filter dicts compiled to Spark
  ``Column`` expressions (the delegation point at ``db/db.go:113``).

Everything is expressed as DataFrame transformations so Catalyst performs
predicate pushdown, column pruning, and top-k (``TakeOrderedAndProject``)
planning; there is no resident index, no server process, and no driver-side
materialization of the filter-match set (the reference's central scalability
flaw, ``db/db.go:113-120``).
"""

from kaer_spark.config import KaerConfig, context_from_config, parse_config
from kaer_spark.context import Collection, KaerContext, dense_ids
from kaer_spark.embeddings import EmbeddingProvider, HashingEmbedder, HTTPEmbedder
from kaer_spark.filters import compile_filter, filter_to_sql
from kaer_spark.operators.asof import asof_join
from kaer_spark.operators.cohort import cohort_retention
from kaer_spark.operators.contamination import (
    bloom_build,
    bloom_contamination_report,
    bloom_decontaminate,
    contamination_report,
    decontaminate,
    overlap_fraction,
)
from kaer_spark.operators.dedup import (
    calibrate_signlsh,
    cluster_representatives,
    dedup_against,
    dedup_cluster_stats,
    dedup_clusters,
    dedup_keep_best,
    dedup_representatives,
    embedding_near_dups,
    embedding_near_dups_between,
    embedding_near_dups_lsh,
    exact_dedup,
    signlsh_candidate_pairs,
    build_minhash_index,
    dedup_against_index,
    minhash_near_dups,
    minhash_near_dups_against_index,
    minhash_near_dups_between,
    duplicate_passages,
    build_shingle_index,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_indexed,
    ngram_containment_pairs_indexed,
    ngram_jaccard_table_pairs,
    write_shingle_bucketed_table,
    passage_overlap_between,
    remove_duplicate_lines,
    remove_repeated_lines,
    remove_duplicate_passages,
    remove_duplicate_passages_against,
    semdedup,
    simhash,
    simhash_near_dups,
    ngram_containment_pairs,
    fuzzy_near_dups,
    fuzzy_near_dups_between,
    minhash_recall_report,
    winnow_fingerprints,
    winnow_overlap_pairs,
    winnow_overlap_between,
    cdc_chunks,
    cdc_dedup_stats,
)
from kaer_spark.operators.interval import (
    interval_coverage,
    interval_join,
    merge_intervals,
    time_bucket_join,
)
from kaer_spark.operators.knn import exact_knn, hard_negatives, knn_join
from kaer_spark.operators.similarity import (
    ivf_knn_join,
    ivf_pq_topk,
    mmr_rerank,
    pq_topk_refined,
)
from kaer_spark.operators.sketches import (
    hll_distinct,
    hll_distinct_by,
    hll_distinct_tokens,
    hll_estimate,
    hll_merge,
    hll_registers,
    cms_build,
    cms_merge,
    cms_query,
)
from kaer_spark.operators.packing import pack_sequences, pack_stats
from kaer_spark.operators.ranking import (
    bigram_lm_fit,
    bigram_lm_scores,
    bm25_scores,
    bpe_token_counts,
    bpe_train_merges,
    build_vocab,
    dsir_scores,
    ngram_novelty,
    oov_stats,
    pmi_bigrams,
    perplexity_buckets,
    subword_segment_counts,
    token_divergence,
    zipf_profile,
)
from kaer_spark.operators.sampling import (
    exemplars_per_group,
    hash_sample,
    quota_per_group,
    pps_systematic_sample,
    pps_systematic_sample_by,
    sampled_quantiles,
    temperature_rates,
    token_budget_mix,
    weighted_mix,
)
from kaer_spark.operators.hybrid import rrf_fuse
from kaer_spark.operators.multimodal import image_dhash, image_near_dups
from kaer_spark.operators.skew import salted_join
from kaer_spark.operators.text_index import (
    build_text_index,
    refresh_text_index,
    search_near,
    search_phrase,
    search_text_index,
)
from kaer_spark.pipelines import (
    corpus_datasheet,
    corpus_stats,
    token_budget_pipeline,
    histogram,
    prepare_training_corpus,
    stratified_split,
    top_quality_fraction,
)
from kaer_spark.session import get_spark

__all__ = [
    "KaerContext",
    "KaerConfig",
    "parse_config",
    "context_from_config",
    "Collection",
    "dense_ids",
    "compile_filter",
    "filter_to_sql",
    "get_spark",
    "EmbeddingProvider",
    "HashingEmbedder",
    "HTTPEmbedder",
    "exact_knn",
    "knn_join",
    "hard_negatives",
    "exact_dedup",
    "build_shingle_index",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_indexed",
    "ngram_containment_pairs_indexed",
    "ngram_jaccard_table_pairs",
    "write_shingle_bucketed_table",
    "build_minhash_index",
    "dedup_against_index",
    "minhash_near_dups",
    "minhash_near_dups_against_index",
    "minhash_near_dups_between",
    "dedup_against",
    "simhash",
    "simhash_near_dups",
    "embedding_near_dups",
    "asof_join",
    "interval_join",
    "time_bucket_join",
    "merge_intervals",
    "interval_coverage",
    "salted_join",
    "image_dhash",
    "image_near_dups",
    "rrf_fuse",
    "build_text_index",
    "search_text_index",
    "prepare_training_corpus",
    "corpus_stats",
    "corpus_datasheet",
    "calibrate_signlsh",
    "ivf_knn_join",
    "token_budget_mix",
    "temperature_rates",
    "bigram_lm_fit",
    "bigram_lm_scores",
    "dsir_scores",
    "perplexity_buckets",
    "duplicate_passages",
    "contamination_report",
    "decontaminate",
    "overlap_fraction",
    "token_budget_pipeline",
    "embedding_near_dups_between",
    "embedding_near_dups_lsh",
    "signlsh_candidate_pairs",
    "dedup_clusters",
    "dedup_cluster_stats",
    "cluster_representatives",
    "dedup_keep_best",
    "dedup_representatives",
    "remove_duplicate_lines",
    "remove_repeated_lines",
    "remove_duplicate_passages",
    "remove_duplicate_passages_against",
    "passage_overlap_between",
    "semdedup",
    "cohort_retention",
    "pack_sequences",
    "pack_stats",
    "bm25_scores",
    "oov_stats",
    "build_vocab",
    "hash_sample",
    "exemplars_per_group",
    "quota_per_group",
    "pps_systematic_sample",
    "pps_systematic_sample_by",
    "sampled_quantiles",
    "weighted_mix",
    "histogram",
    "stratified_split",
    "top_quality_fraction",
    # r11 additions
    "ngram_containment_pairs",
    "fuzzy_near_dups",
    "fuzzy_near_dups_between",
    "minhash_recall_report",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "winnow_overlap_between",
    "cdc_chunks",
    "cdc_dedup_stats",
    "bloom_build",
    "bloom_contamination_report",
    "bloom_decontaminate",
    "hll_distinct",
    "hll_distinct_by",
    "hll_distinct_tokens",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "cms_build",
    "cms_merge",
    "cms_query",
    "ivf_pq_topk",
    "mmr_rerank",
    "pq_topk_refined",
    "refresh_text_index",
    "search_phrase",
    "search_near",
    "ngram_novelty",
    "pmi_bigrams",
    "token_divergence",
    "zipf_profile",
    "subword_segment_counts",
    "bpe_train_merges",
    "bpe_token_counts",
]
__version__ = "0.1.0"
