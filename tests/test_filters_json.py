"""Schemaless (JSON/variant) filter compiler: Spark↔DuckDB parity matrix
over ragged metadata, plus Mongo missing-vs-null semantics and the
schemaless Collection round trip.

The reference accepts arbitrary bson.M metadata (db/db.go:44-47); these
documents intentionally mix types per key, omit keys, and carry explicit
nulls — everything FieldTypeConflict rejects in typed mode."""

from __future__ import annotations

import json

import duckdb
import pytest

from kaer_spark.filters import FilterError
from kaer_spark.filters_json import compile_filter_json, filter_json_to_sql

DOCS = [
    {"lang": "en", "n": 1, "score": 0.5, "tags": ["a", "b"], "extra": {"depth": 2}},
    {"lang": "fr", "n": 2, "score": 1.5, "tags": ["b", "c", "d"]},
    {"lang": None, "n": 3, "flag": True},
    {"n": "3", "flag": False},  # n is a STRING here — ragged typing
    {"lang": "en", "n": -7, "score": 2, "tags": []},
    {"lang": "de", "score": None, "extra": {"depth": 5}},
    {},
]

CASES = [
    {},
    {"lang": "en"},
    {"lang": {"$eq": None}},
    {"lang": {"$ne": None}},
    {"lang": {"$ne": "en"}},
    {"n": 3},  # must NOT match the string "3"
    {"n": {"$eq": "3"}},  # must match ONLY the string "3"
    {"n": {"$gt": 1}},
    {"n": {"$gte": 1, "$lt": 3}},
    {"score": {"$gt": 0.4}},
    {"score": 2},  # int operand matches double-typed 2? JSON 2 is int; 2.0 matches via double
    {"lang": {"$in": ["en", "de"]}},
    {"lang": {"$in": ["en", None]}},
    {"lang": {"$nin": ["en", "fr"]}},
    {"lang": {"$exists": True}},
    {"lang": {"$exists": False}},
    {"score": {"$exists": True}},
    {"flag": True},
    {"flag": {"$ne": True}},
    {"lang": {"$regex": "^e"}},
    {"n": {"$mod": [7, -0]}},
    {"n": {"$mod": [2, 1]}},
    {"tags": {"$size": 2}},
    {"tags": {"$size": 0}},
    {"tags": {"$all": ["b"]}},
    {"tags": {"$all": ["a", "b"]}},
    {"tags": {"$elemMatch": {"$eq": "c"}}},
    {"extra.depth": {"$gt": 3}},
    {"extra.depth": {"$exists": True}},
    {"lang": {"$type": "string"}},
    {"lang": {"$type": "null"}},
    {"n": {"$type": "int"}},
    {"n": {"$type": "string"}},
    {"score": {"$type": "double"}},
    {"score": {"$type": "number"}},
    {"tags": {"$type": "array"}},
    {"extra": {"$type": "object"}},
    {"flag": {"$type": "bool"}},
    {"lang": {"$not": {"$eq": "en"}}},
    {"$and": [{"lang": "en"}, {"n": {"$gte": 1}}]},
    {"$or": [{"lang": "de"}, {"flag": True}]},
    {"$nor": [{"lang": "en"}, {"lang": "fr"}]},
]


@pytest.fixture(scope="module")
def meta_df(spark):
    rows = [
        (i, json.dumps(d, sort_keys=True, separators=(",", ":")))
        for i, d in enumerate(DOCS)
    ]
    return spark.createDataFrame(rows, "id long, _m_meta string")


@pytest.fixture(scope="module")
def duck(tmp_path_factory):
    con = duckdb.connect()
    rows = [
        (i, json.dumps(d, sort_keys=True, separators=(",", ":")))
        for i, d in enumerate(DOCS)
    ]
    con.execute("CREATE TABLE m (id BIGINT, _m_meta VARCHAR)")
    con.executemany("INSERT INTO m VALUES (?, ?)", rows)
    return con


@pytest.mark.parametrize("filt", CASES, ids=[str(c)[:60] for c in CASES])
def test_json_filter_matches_duckdb(meta_df, duck, filt):
    got = sorted(
        r[0] for r in meta_df.filter(compile_filter_json(filt)).select("id").collect()
    )
    pred = filter_json_to_sql(filt)
    want = sorted(
        r[0] for r in duck.execute(f"SELECT id FROM m WHERE {pred}").fetchall()
    )
    assert got == want, f"{filt}: spark={got} duck={want}\nSQL: {pred}"


def test_missing_vs_null_distinction(meta_df):
    def ids(filt):
        return sorted(
            r[0]
            for r in meta_df.filter(compile_filter_json(filt)).select("id").collect()
        )

    # lang: present in 0,1,2(null),4,5 — missing in 3,6
    assert ids({"lang": {"$exists": True}}) == [0, 1, 2, 4, 5]
    assert ids({"lang": {"$exists": False}}) == [3, 6]
    # {lang: null} matches missing OR null — Mongo semantics
    assert ids({"lang": None}) == [2, 3, 6]
    assert ids({"lang": {"$ne": None}}) == [0, 1, 4, 5]
    # $type "null" matches ONLY present-null, never missing
    assert ids({"lang": {"$type": "null"}}) == [2]


def test_type_bracketing(meta_df):
    """BSON equality is type-bracketed: numbers never match strings."""
    def ids(filt):
        return sorted(
            r[0]
            for r in meta_df.filter(compile_filter_json(filt)).select("id").collect()
        )

    assert ids({"n": 3}) == [2]          # the number 3 only
    assert ids({"n": {"$eq": "3"}}) == [3]  # the string "3" only
    assert ids({"score": 2}) == [4]      # int operand matches JSON number 2
    assert ids({"score": 2.0}) == [4]    # cross numeric-type, like Mongo


def test_bad_filters_raise():
    with pytest.raises(FilterError):
        compile_filter_json({"$bogus": 1})
    with pytest.raises(FilterError):
        compile_filter_json({"k": {"$type": "decimal128"}})
    with pytest.raises(FilterError):
        compile_filter_json({"k": {"$mod": [2]}})
    with pytest.raises(FilterError):
        filter_json_to_sql({"k": {"$wat": 1}})


def test_schemaless_collection_roundtrip(spark, tmp_path):
    """The reference flow with ragged metadata that typed mode rejects:
    mixed types per key, missing keys, nested docs — insert, filtered kNN,
    reopen."""
    from kaer_spark.context import KaerContext

    ctx = KaerContext(spark, str(tmp_path / "kaer"))
    coll = ctx.create_collection("ragged", schemaless=True)
    coll.insert(
        ["alpha doc", "beta doc", "gamma doc", "delta doc"],
        [
            {"tag": "x", "v": 1},
            {"tag": "y", "v": "one"},  # v flips type — FieldTypeConflict in typed mode
            {"nested": {"k": 9}},
            {"tag": "x", "v": None},
        ],
    )
    hits = coll.query("alpha doc", k=10, filter={"tag": "x"}).collect()
    assert sorted(r["_m_id"] for r in hits) == [0, 3]
    hits = coll.query("alpha doc", k=10, filter={"v": {"$type": "string"}}).collect()
    assert [r["_m_id"] for r in hits] == [1]
    hits = coll.query("alpha doc", k=10, filter={"nested.k": {"$exists": True}}).collect()
    assert [r["_m_id"] for r in hits] == [2]
    # {v: null} matches explicit null AND rows without v — Mongo contract
    hits = coll.query("alpha doc", k=10, filter={"v": None}).collect()
    assert sorted(r["_m_id"] for r in hits) == [2, 3]
    # reopen: schemaless flag persists in the catalog
    c2 = KaerContext(spark, str(tmp_path / "kaer")).get_collection("ragged")
    assert c2.meta["schemaless"] is True
    assert c2.count() == 4
    hits = c2.query("beta doc", k=1, filter={"tag": {"$in": ["x", "y"]}}).collect()
    assert len(hits) == 1


def test_schemaless_approximate_query_with_filter(spark, tmp_path):
    """Schemaless + IVF integration: the index table carries _m_meta (all
    corpus columns partition by cell), so variant-compiled filters apply
    inside the probed cells exactly as on the exact path."""
    from kaer_spark.context import KaerContext

    ctx = KaerContext(spark, str(tmp_path / "kaer"))
    coll = ctx.create_collection("ragged_ivf", schemaless=True)
    coll.insert(
        [f"doc number {i}" for i in range(40)],
        [
            {"grp": "a" if i % 2 == 0 else "b", "rank": i}
            if i % 3 != 0
            else {"grp": "a" if i % 2 == 0 else "b"}  # rank missing on 1/3
            for i in range(40)
        ],
    )
    coll.build_index(cells=4)
    exact = coll.query("doc number 7", k=5, filter={"grp": "a", "rank": {"$exists": True}})
    approx = coll.query(
        "doc number 7", k=5, filter={"grp": "a", "rank": {"$exists": True}},
        approximate=True, nprobe=4,
    )
    # nprobe == cells ⇒ identical result set (and the filter held: all grp=a)
    e = [r["_m_id"] for r in exact.collect()]
    a = [r["_m_id"] for r in approx.collect()]
    assert e == a and len(e) == 5
    import json as _json

    metas = [
        _json.loads(r["_m_meta"]) for r in approx.collect()
    ]
    assert all(m["grp"] == "a" and "rank" in m for m in metas)
