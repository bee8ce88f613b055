"""Filter-compiler unit matrix (F-Q4): one case per Mongo operator,
cross-checked against a DuckDB translation of the same filter, including
null/missing-field semantics."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from kaer_spark.filters import FilterError, compile_filter, filter_to_sql

CASES = [
    {},
    {"lang": "en"},
    {"lang": {"$eq": "de"}},
    {"lang": {"$ne": "en"}},
    {"n_chars": {"$gt": 200}},
    {"n_chars": {"$gte": 200, "$lt": 400}},
    {"source": {"$in": ["src1", "src2", "src3"]}},
    {"source": {"$nin": ["src1", "src2"]}},
    {"lang": {"$exists": True}},
    {"text": {"$regex": "^the "}},
    {"n_chars": {"$mod": [7, 3]}},
    {"$and": [{"lang": "en"}, {"n_chars": {"$lte": 300}}]},
    {"$or": [{"lang": "zh"}, {"source": "src5"}]},
    {"$nor": [{"lang": "en"}, {"lang": "fr"}]},
    {"lang": {"$not": {"$eq": "en"}}},
    {"lang": "en", "source": "src1", "n_chars": {"$gt": 100}},
]


@pytest.mark.parametrize("filt", CASES, ids=[str(c)[:50] for c in CASES])
def test_filter_matches_duckdb(spark, documents, sf_dir, filt):
    got = sorted(
        r[0] for r in documents.filter(compile_filter(filt)).select("doc_id").collect()
    )
    sql_pred = filter_to_sql(filt)
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet' WHERE {sql_pred}"
        ).fetchall()
    )
    assert got == want, f"filter {filt}: spark {len(got)} rows vs duckdb {len(want)}"


def test_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, v string"
    )

    def ids(filt):
        return sorted(r[0] for r in df.filter(compile_filter(filt)).select("id").collect())

    assert ids({"v": {"$ne": "a"}}) == [2, 3]  # missing field matches $ne
    assert ids({"v": {"$eq": None}}) == [2]
    assert ids({"v": {"$ne": None}}) == [1, 3]
    assert ids({"v": {"$exists": False}}) == [2]
    assert ids({"v": {"$exists": True}}) == [1, 3]
    assert ids({"v": {"$nin": ["a"]}}) == [2, 3]
    assert ids({"v": {"$in": ["a", None]}}) == [1, 2]
    assert ids({"v": {"$not": {"$eq": "a"}}}) == [2, 3]
    assert ids({"$nor": [{"v": "a"}, {"v": "b"}]}) == [2]


def test_array_operators(spark):
    df = spark.createDataFrame(
        [(1, ["x", "y"]), (2, ["x"]), (3, [])],
        "id long, tags array<string>",
    )

    def ids(filt):
        return sorted(r[0] for r in df.filter(compile_filter(filt)).select("id").collect())

    assert ids({"tags": {"$size": 2}}) == [1]
    assert ids({"tags": {"$all": ["x", "y"]}}) == [1]
    assert ids({"tags": {"$all": ["x"]}}) == [1, 2]


def test_elem_match(spark):
    df = spark.createDataFrame(
        [(1, [1, 5]), (2, [2]), (3, [])], "id long, ns array<int>"
    )
    got = sorted(
        r[0]
        for r in df.filter(compile_filter({"ns": {"$elemMatch": {"$gt": 3}}}))
        .select("id")
        .collect()
    )
    assert got == [1]


def test_errors():
    for bad in [
        {"$and": []},
        {"$unknown": 1},
        {"f": {"$badop": 1}},
        {"f": {"$mod": [1]}},
        "not-a-dict",
    ]:
        with pytest.raises(FilterError):
            compile_filter(bad)  # type: ignore[arg-type]
