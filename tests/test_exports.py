"""Package-surface contract: everything __all__ promises exists, and the
README quick-start imports keep working."""

from __future__ import annotations


def test_all_exports_resolve():
    import kaer_spark as k

    missing = [n for n in k.__all__ if not hasattr(k, n)]
    assert not missing, missing


def test_readme_quickstart_imports():
    from kaer_spark import (  # noqa: F401
        KaerContext,
        bigram_lm_fit,
        bigram_lm_scores,
        dedup_against,
        dsir_scores,
        duplicate_passages,
        get_spark,
        overlap_fraction,
        perplexity_buckets,
        token_budget_mix,
        token_budget_pipeline,
    )
    from kaer_spark.context import Collection

    assert callable(Collection.deduplicate_against)
