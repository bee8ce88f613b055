"""Composed training-data pipeline: filtering, dedup determinism, stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaer_spark.pipelines import corpus_stats, prepare_training_corpus


def test_pipeline_filters_and_dedups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog in the park"),
        (2, "the quick brown fox jumps over the lazy dog in the park"),  # dup of 1
        (3, "!!! ??? !!! ??? !!!"),  # junk: high punct ratio
        (4, "a different long enough document with many plain words and the usual structure"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = prepare_training_corpus(docs, min_quality=0.5, min_tokens=5)
    kept = {r["doc_id"] for r in out.collect()}
    assert 3 not in kept  # junk filtered
    assert kept & {1, 2} == {1}  # min-id representative of the dup group
    assert 4 in kept


def test_pipeline_columns_and_stats(documents):
    corpus = prepare_training_corpus(documents.limit(100), min_quality=0.0)
    assert set(corpus.columns) == {"doc_id", "text", "lang_guess", "quality", "n_tokens", "fp"}
    stats = corpus_stats(corpus)
    total = stats.agg(F.sum("n_docs")).collect()[0][0]
    assert total == corpus.count()


def test_pipeline_lang_restriction(documents):
    corpus = prepare_training_corpus(documents.limit(200), min_quality=0.0, langs=["en"])
    langs = {r["lang_guess"] for r in corpus.select("lang_guess").distinct().collect()}
    assert langs <= {"en"}
