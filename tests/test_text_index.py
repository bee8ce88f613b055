"""Materialized inverted text index: build/search roundtrip, bit-exact
parity with the scan-path BM25, bucket partition pruning, and the sidecar
contract."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from kaer_spark.operators.text_index import (
    build_text_index,
    py_term_hash,
    read_text_index_meta,
    search_text_index,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark shuffle join hash join broadcast"),
        (2, "join the hash table scan now"),
        (3, "completely unrelated words only here"),
        (4, "scan scan scan scan"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_search_roundtrip_and_parity(spark, corpus, tmp_path):
    """Index-path scores must equal the scan-path bm25_scores doubles
    exactly, restricted to docs holding at least one term; docs with no
    query terms never appear."""
    from kaer_spark.operators.ranking import bm25_scores

    path = str(tmp_path / "tix")
    meta = build_text_index(corpus, path)
    assert meta["n_docs"] == 5 and meta["sum_dl"] == 6 + 6 + 5 + 4
    terms = ["join", "scan"]
    got = search_text_index(spark, path, terms, k=10).collect()
    ids = [r["id"] for r in got]
    assert 3 not in ids and 5 not in ids  # no query terms → not candidates
    assert set(ids) == {1, 2, 4}
    ref = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(corpus, terms).collect()
    }
    for r in got:
        assert r["bm25"] == ref[r["id"]]  # exact doubles, no tolerance
    # descending by score, ties by id
    scores = [r["bm25"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_search_prunes_posting_partitions(spark, corpus, tmp_path):
    """Query buckets are computed driver-side and appear as partition
    filters on the postings scan — a search must not read every bucket."""
    path = str(tmp_path / "tix2")
    meta = build_text_index(corpus, path, n_buckets=16)
    df = search_text_index(spark, path, ["join"], k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    want = py_term_hash("join") % meta["n_buckets"]
    assert f"bucket#" in plan or "PartitionFilters" in plan
    assert str(want) in plan  # the literal bucket id reached the scan
    assert df.count() <= 3


def test_search_validates_and_reads_meta(spark, corpus, tmp_path):
    path = str(tmp_path / "tix3")
    build_text_index(corpus, path, n_buckets=8)
    assert read_text_index_meta(path)["n_buckets"] == 8
    with pytest.raises(ValueError):
        search_text_index(spark, path, [])
    # uppercase query terms are lowercased like the build side
    up = search_text_index(spark, path, ["JOIN"], k=5).collect()
    lo = search_text_index(spark, path, ["join"], k=5).collect()
    assert [(r["id"], r["bm25"]) for r in up] == [(r["id"], r["bm25"]) for r in lo]
