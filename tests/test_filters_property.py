"""Property-based filter-compiler check: random Mongo filter documents run
through ``compile_filter`` (Spark) and ``filter_to_sql`` (DuckDB) over the
same table — including NULL rows, where Mongo semantics ($ne/$nin/$not
matching missing fields) diverge from SQL three-valued logic — must select
identical row sets.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kaer_spark.filters import compile_filter, filter_to_sql

ROWS = pd.DataFrame(
    {
        "rid": range(12),
        "lang": ["en", "de", None, "fr", "en", None, "zh", "de", "en", None, "fr", "es"],
        "n": [10, 250, 40, None, 999, 7, 77, None, 300, 0, 13, 21],
        "src": [f"s{i % 4}" for i in range(10)] + [None, None],
        "tags": [
            [1, 2, 3], [], [2], [1, 5], None, [3, 4, 5], [1], [2, 3], [9], None, [5, 1], [4],
        ],
    }
)

LANGS = ["en", "de", "fr", "zh", "missing"]
INTS = [0, 7, 13, 24, 250, 999]


def leaf_clauses() -> st.SearchStrategy[dict]:
    scalar_ops = st.one_of(
        st.sampled_from(LANGS).map(lambda v: {"lang": v}),
        st.sampled_from(LANGS + [None]).map(lambda v: {"lang": {"$eq": v}}),
        st.sampled_from(LANGS + [None]).map(lambda v: {"lang": {"$ne": v}}),
        st.sampled_from(["$gt", "$gte", "$lt", "$lte"]).flatmap(
            lambda op: st.sampled_from(INTS).map(lambda v: {"n": {op: v}})
        ),
        st.lists(st.sampled_from(LANGS + [None]), min_size=1, max_size=3).map(
            lambda vs: {"lang": {"$in": vs}}
        ),
        st.lists(st.sampled_from(LANGS), min_size=1, max_size=3).map(
            lambda vs: {"lang": {"$nin": vs}}
        ),
        st.booleans().map(lambda b: {"n": {"$exists": b}}),
        st.sampled_from(INTS[1:]).flatmap(
            lambda d: st.integers(0, 3).map(lambda r: {"n": {"$mod": [d, r]}})
        ),
        st.sampled_from(["^s1", "s[02]"]).map(lambda p: {"src": {"$regex": p}}),
        st.sampled_from(LANGS).map(lambda v: {"lang": {"$not": {"$eq": v}}}),
        st.sampled_from(INTS).map(lambda v: {"n": {"$not": {"$gt": v}}}),
        st.tuples(st.sampled_from(INTS), st.sampled_from(INTS)).map(
            lambda t: {"n": {"$gte": min(t), "$lt": max(t) + 1}}
        ),
        st.integers(0, 4).map(lambda v: {"tags": {"$size": v}}),
        st.lists(st.integers(1, 5), min_size=1, max_size=2).map(
            lambda vs: {"tags": {"$all": vs}}
        ),
        st.integers(0, 6).map(lambda v: {"tags": {"$elemMatch": {"$gt": v}}}),
        st.integers(0, 6).map(lambda v: {"tags": {"$elemMatch": {"$gte": v, "$lt": v + 3}}}),
    )
    return scalar_ops


def filter_docs(depth: int = 2) -> st.SearchStrategy[dict]:
    if depth == 0:
        return leaf_clauses()
    sub = filter_docs(depth - 1)
    return st.one_of(
        leaf_clauses(),
        st.lists(sub, min_size=1, max_size=3).map(lambda cs: {"$and": cs}),
        st.lists(sub, min_size=1, max_size=3).map(lambda cs: {"$or": cs}),
        st.lists(sub, min_size=1, max_size=2).map(lambda cs: {"$nor": cs}),
    )


@pytest.fixture(scope="module")
def sdf(spark):
    df = spark.createDataFrame(
        ROWS.astype(object).where(ROWS.notna(), None),
        schema="rid LONG, lang STRING, n LONG, src STRING, tags ARRAY<LONG>",
    )
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("t", ROWS)
    return con


@given(doc=filter_docs())
@settings(
    max_examples=80,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_filter_matches_duckdb_oracle(sdf, duck, doc):
    spark_ids = sorted(
        r["rid"] for r in sdf.filter(compile_filter(doc)).select("rid").collect()
    )
    sql = filter_to_sql(doc)
    duck_ids = sorted(
        r[0] for r in duck.sql(f"SELECT rid FROM t WHERE {sql}").fetchall()
    )
    assert spark_ids == duck_ids, f"filter {doc!r} → spark {spark_ids} duck {duck_ids} (sql: {sql})"


# ---------------------------------------------------------------------------
# schemaless (JSON/variant) compiler: same fuzz, ragged documents
# ---------------------------------------------------------------------------

JSON_DOCS = [
    {"lang": "en", "n": 10, "tags": [1, 2, 3]},
    {"lang": "de", "n": 250, "src": "s1", "tags": []},
    {"lang": None, "n": 40},
    {"lang": "fr", "src": "s2", "tags": [1, 5]},
    {"lang": "en", "n": 999, "flag": True},
    {"n": 7, "tags": [3, 4, 5], "flag": False},
    {"lang": "zh", "n": "77"},  # n is a STRING here — ragged typing
    {"lang": "de", "src": None},
    {"lang": "en", "n": 300, "nested": {"d": 4}},
    {"n": 0, "src": "s0"},
    {"lang": "fr", "n": 13, "tags": [5, 1], "nested": {"d": 9}},
    {},
]


def json_leaves() -> st.SearchStrategy[dict]:
    return st.one_of(
        st.sampled_from(LANGS).map(lambda v: {"lang": v}),
        st.sampled_from(LANGS + [None]).map(lambda v: {"lang": {"$eq": v}}),
        st.sampled_from(LANGS + [None]).map(lambda v: {"lang": {"$ne": v}}),
        st.sampled_from(["$gt", "$gte", "$lt", "$lte"]).flatmap(
            lambda op: st.sampled_from(INTS).map(lambda v: {"n": {op: v}})
        ),
        st.lists(st.sampled_from(LANGS + [None]), min_size=1, max_size=3).map(
            lambda vs: {"lang": {"$in": vs}}
        ),
        st.lists(st.sampled_from(LANGS), min_size=1, max_size=3).map(
            lambda vs: {"lang": {"$nin": vs}}
        ),
        st.booleans().map(lambda b: {"n": {"$exists": b}}),
        st.booleans().map(lambda b: {"src": {"$exists": b}}),
        st.booleans().map(lambda b: {"flag": b}),
        st.sampled_from(
            ["string", "int", "double", "number", "null", "array", "object", "bool"]
        ).flatmap(
            lambda t: st.sampled_from(["lang", "n", "tags", "nested", "flag"]).map(
                lambda f: {f: {"$type": t}}
            )
        ),
        st.sampled_from(INTS[1:]).flatmap(
            lambda d: st.integers(0, 3).map(lambda r: {"n": {"$mod": [d, r]}})
        ),
        st.sampled_from(["^s1", "s[02]"]).map(lambda p: {"src": {"$regex": p}}),
        st.sampled_from(LANGS).map(lambda v: {"lang": {"$not": {"$eq": v}}}),
        st.integers(0, 4).map(lambda v: {"tags": {"$size": v}}),
        st.lists(st.integers(1, 5), min_size=1, max_size=2).map(
            lambda vs: {"tags": {"$all": vs}}
        ),
        st.integers(0, 6).map(lambda v: {"tags": {"$elemMatch": {"$gt": v}}}),
        st.integers(0, 9).map(lambda v: {"nested.d": {"$gte": v}}),
    )


def json_filter_docs(depth: int = 2) -> st.SearchStrategy[dict]:
    if depth == 0:
        return json_leaves()
    sub = json_filter_docs(depth - 1)
    return st.one_of(
        json_leaves(),
        st.lists(sub, min_size=1, max_size=3).map(lambda cs: {"$and": cs}),
        st.lists(sub, min_size=1, max_size=3).map(lambda cs: {"$or": cs}),
        st.lists(sub, min_size=1, max_size=2).map(lambda cs: {"$nor": cs}),
    )


@pytest.fixture(scope="module")
def json_sdf(spark):
    import json as _json

    rows = [
        (i, _json.dumps(d, sort_keys=True, separators=(",", ":")))
        for i, d in enumerate(JSON_DOCS)
    ]
    df = spark.createDataFrame(rows, "rid LONG, _m_meta STRING").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def json_duck():
    import json as _json

    con = duckdb.connect()
    con.execute("CREATE TABLE jm (rid BIGINT, _m_meta VARCHAR)")
    con.executemany(
        "INSERT INTO jm VALUES (?, ?)",
        [
            (i, _json.dumps(d, sort_keys=True, separators=(",", ":")))
            for i, d in enumerate(JSON_DOCS)
        ],
    )
    return con


@given(doc=json_filter_docs())
@settings(
    max_examples=80,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_json_filter_matches_duckdb_oracle(json_sdf, json_duck, doc):
    from kaer_spark.filters_json import compile_filter_json, filter_json_to_sql

    spark_ids = sorted(
        r["rid"]
        for r in json_sdf.filter(compile_filter_json(doc)).select("rid").collect()
    )
    sql = filter_json_to_sql(doc)
    duck_ids = sorted(
        r[0] for r in json_duck.sql(f"SELECT rid FROM jm WHERE {sql}").fetchall()
    )
    assert spark_ids == duck_ids, (
        f"filter {doc!r} → spark {spark_ids} duck {duck_ids} (sql: {sql})"
    )
