"""Plan-shape regression tests: the engine's scale contract, checked
against the actual physical plans (a plan regression fails here instead of
silently costing 10× on a cluster)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kaer_spark.filters import compile_filter
from kaer_spark.operators.knn import exact_knn
from kaer_spark.plans import (
    executed_plan,
    explain_summary,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

QVEC = [0.1] * 64


def test_filter_pushdown_reaches_scan(documents):
    df = documents.filter(compile_filter({"lang": "de", "n_chars": {"$gt": 100}}))
    pushed = " ".join(pushed_filters(df))
    assert "EqualTo(lang,de)" in pushed
    assert "GreaterThan(n_chars,100)" in pushed


def test_column_pruning(documents):
    df = documents.select("doc_id", "lang")
    cols = read_schema_columns(df)
    assert cols and cols[0] == {"doc_id", "lang"}


def test_knn_is_takeordered_with_broadcast(corpus):
    df = exact_knn(corpus, QVEC, 5, vec_col="embedding", id_col="doc_id",
                   filter={"lang": "en"})
    s = explain_summary(df)
    assert s["has_take_ordered"], "top-k must plan as TakeOrderedAndProject"
    assert s["n_sortmerge_joins"] == 0, "1:1 doc/emb join must broadcast"
    assert has_broadcast_join(df)


def test_knn_never_global_sorts(corpus):
    df = exact_knn(corpus, QVEC, 5, vec_col="embedding", id_col="doc_id")
    plan = executed_plan(df)
    assert "Sort " not in plan.replace("TakeOrderedAndProject", "")


def test_small_dim_joins_broadcast(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
    assert has_broadcast_join(j)


def test_metadata_only_scan_skips_embeddings(corpus):
    """Projecting only metadata must not read the (wide) embedding column."""
    df = corpus.filter(F.col("lang") == "en").select("doc_id", "lang")
    for cols in read_schema_columns(df):
        # the embeddings-side scan may survive for the join, but a pure
        # documents projection must not include the vector bytes
        if "embedding" in cols:
            assert cols == {"embedding", "vec_id"}  # join key + value only
