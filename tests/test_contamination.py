"""Contamination detection: known-overlap fixtures, decontaminate inverse,
and plan shape (test side broadcast, no corpus-side shuffle before probe)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kaer_spark.operators.contamination import (
    contamination_pairs,
    contamination_report,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus_pair(spark):
    train = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # shares "a b c", "b c d" with test 100
            (2, "x y z w q r"),        # shares "x y z" with test 101
            (3, "c d e x y z"),        # shares "x y z" with test 101
            (4, "p q r s t u"),        # clean
            (5, ""),                   # empty doc -> no grams
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "a b c d zz"), (101, "x y z qq ww")],
        "doc_id long, text string",
    )
    return train, test


def test_pairs_exact(spark, corpus_pair):
    train, test = corpus_pair
    got = {
        (r["doc_id"], r["test_doc_id"]): r["shared_grams"]
        for r in contamination_pairs(train, test, n=3).collect()
    }
    assert got == {(1, 100): 2, (2, 101): 1, (3, 101): 1}


def test_report_counts_distinct_grams_once(spark, corpus_pair):
    train, test = corpus_pair
    got = {r["doc_id"]: r["hits"] for r in contamination_report(train, test, n=3).collect()}
    assert got == {1: 2, 2: 1, 3: 1}


def test_decontaminate_keeps_clean_docs(spark, corpus_pair):
    train, test = corpus_pair
    kept = sorted(r["doc_id"] for r in decontaminate(train, test, n=3).collect())
    assert kept == [4, 5]


def test_gram_repeated_in_test_counted_once(spark):
    # the same gram in two test docs must not double-count a train hit
    train = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    test = spark.createDataFrame(
        [(100, "a b c"), (101, "a b c")], "doc_id long, text string"
    )
    got = contamination_report(train, test, n=3).collect()
    assert [(r["doc_id"], r["hits"]) for r in got] == [(1, 1)]


def test_probe_is_broadcast(spark, corpus_pair):
    train, test = corpus_pair
    plan = (
        contamination_report(train, test, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # shuffles touch only the small side: the test-set distinct and the
    # final (post-probe) groupBy(doc_id) — the corpus itself is never
    # hash-partitioned before the probe
    assert plan.count("Exchange hashpartitioning") <= 2


def test_overlap_fraction_bounds_and_values(spark):
    """overlap_fraction: fully-copied eval text scores 1.0, fully-novel
    scores 0.0, a half-overlapping doc lands exactly at its integer
    fraction, and gram-less docs get NULL."""
    from kaer_spark.operators.contamination import overlap_fraction

    train = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),          # all 2 trigrams in train
            (2, "one two three four"),               # none of 2 trigrams
            (3, "alpha beta gamma nine ten eleven"),  # 1 of 4 trigrams
            (4, "too short"),                         # no trigram
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_overlapping"], r["overlap_frac"])
        for r in overlap_fraction(ev, train, n=3, unit="word").collect()
    }
    assert got[1] == (2, 2, 1.0)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (4, 1, 0.25)
    assert got[4] == (0, 0, None)
