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


def test_rrf_fuse_python_replay(spark):
    """RRF fusion ≡ python arithmetic: overlap boosts, absent side
    contributes 0, ties break to min id, validation raises."""
    from kaer_spark.operators.hybrid import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rank long")
    b = spark.createDataFrame([(3, 1), (4, 2), (1, 3)], "id long, rank long")
    got = {r["id"]: r for r in rrf_fuse([a, b], k=10).collect()}
    import pytest as _pytest

    def rrf(r1, r2):
        s = 0.0
        s += 1.0 / (60.0 + r1) if r1 else 0.0
        return s + (1.0 / (60.0 + r2) if r2 else 0.0)

    assert got[1]["rrf"] == rrf(1, 3) and got[1]["rank_0"] == 1 and got[1]["rank_1"] == 3
    assert got[2]["rrf"] == rrf(2, None) and got[2]["rank_1"] is None
    assert got[3]["rrf"] == rrf(3, 1)
    assert got[4]["rrf"] == rrf(None, 2) and got[4]["rank_0"] is None
    # overlap docs (1, 3) outrank single-list docs
    order = [r["id"] for r in rrf_fuse([a, b], k=10).collect()]
    assert set(order[:2]) == {1, 3}
    with _pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_ranks_favor_both_modalities(spark, corpus, tmp_path):
    """End-to-end: fuse a term ranking with a fake 'vector' ranking and
    confirm a doc strong in both beats docs strong in only one."""
    from pyspark.sql import functions as F

    from kaer_spark.operators.hybrid import rrf_fuse, with_rank
    from kaer_spark.operators.ranking import bm25_scores

    text_top = (
        bm25_scores(corpus, ["join"])
        .select(F.col("doc_id").alias("id"), "bm25")
        .orderBy(F.col("bm25").desc(), F.col("id"))
        .limit(3)
    )
    text = with_rank(text_top, [F.col("bm25").desc(), F.col("id")])
    fake_vec = spark.createDataFrame([(1, 1), (4, 2), (3, 3)], "id long, rank long")
    fused = rrf_fuse([text.select("id", "rank"), fake_vec], k=5).collect()
    assert fused[0]["id"] == 1  # top of text ('join' twice) AND top of vec


def test_refresh_text_index_equals_rebuild(spark, tmp_path):
    """Incremental catch-up ≡ full rebuild: index half the corpus, refresh
    with the rest, and every search result (ids AND exact doubles) must
    match an index built from scratch over everything. Second refresh is
    a no-op."""
    from kaer_spark.operators.text_index import refresh_text_index

    rows = [
        (1, "spark shuffle join hash join broadcast"),
        (2, "join the hash table scan now"),
        (3, "completely unrelated words only here"),
        (4, "scan scan scan scan"),
        (5, "late arriving join document"),
        (6, "another late scan join text"),
    ]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    first = full.filter(F.col("doc_id") <= 4)

    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    build_text_index(first, inc_path)
    meta = refresh_text_index(full, inc_path)
    assert meta["n_docs"] == 6 and meta["max_id"] == 6
    build_text_index(full, full_path)
    for terms in (["join"], ["scan", "join"], ["late"]):
        got = [
            (r["id"], r["bm25"])
            for r in search_text_index(spark, inc_path, terms, k=10).collect()
        ]
        want = [
            (r["id"], r["bm25"])
            for r in search_text_index(spark, full_path, terms, k=10).collect()
        ]
        assert got == want, terms
    # idempotent
    again = refresh_text_index(full, inc_path)
    assert again["n_docs"] == 6 and again["sum_dl"] == meta["sum_dl"]


def test_text_index_string_ids_and_empty_build(spark, tmp_path):
    """build accepts any orderable id type (string ids round-trip through
    the sidecar), refresh's high-water filter compares in the column's own
    ordering, and an EMPTY build (max_id None) refreshes by indexing the
    whole DataFrame instead of comparing against a numeric sentinel —
    the r9 advice fix."""
    from kaer_spark.operators.text_index import refresh_text_index

    rows = [("a1", "spark join"), ("b2", "hash join scan"), ("c3", "scan only")]
    full = spark.createDataFrame(rows, "doc_id string, text string")

    # string ids: build half, refresh with the rest, equals full rebuild
    inc, ref = str(tmp_path / "inc"), str(tmp_path / "ref")
    build_text_index(full.filter(F.col("doc_id") <= "b2"), inc)
    meta = refresh_text_index(full, inc)
    assert meta["n_docs"] == 3 and meta["max_id"] == "c3"
    build_text_index(full, ref)
    got = [(r["id"], r["bm25"])
           for r in search_text_index(spark, inc, ["join"], k=5).collect()]
    want = [(r["id"], r["bm25"])
            for r in search_text_index(spark, ref, ["join"], k=5).collect()]
    assert got == want and len(got) == 2

    # empty build → max_id None → refresh indexes everything
    emp = str(tmp_path / "emp")
    m0 = build_text_index(full.filter(F.lit(False)), emp)
    assert m0["max_id"] is None and m0["n_docs"] == 0
    m1 = refresh_text_index(full, emp)
    assert m1["n_docs"] == 3 and m1["max_id"] == "c3"
    got = [(r["id"], r["bm25"])
           for r in search_text_index(spark, emp, ["join"], k=5).collect()]
    assert got == want


def test_search_on_empty_index_returns_empty(spark, tmp_path):
    """An empty index (build before first insert) is a supported state:
    search returns an empty (id, bm25) frame instead of dividing by the
    zero doc count — the r10 advice fix."""
    rows = [("a1", "spark join")]
    full = spark.createDataFrame(rows, "doc_id string, text string")
    emp = str(tmp_path / "emp0")
    build_text_index(full.filter(F.lit(False)), emp)
    out = search_text_index(spark, emp, ["join"], k=5)
    assert out.columns == ["id", "bm25"]
    assert out.count() == 0
    assert dict(out.dtypes)["id"] == "string"  # corpus id type preserved


def test_rebuild_at_same_path_clears_stale_buckets(spark, tmp_path):
    """Rebuilding at an existing path must not leave stale bucket
    partitions behind, regardless of partitionOverwriteMode — a rebuild
    from a SMALLER corpus (fewer touched buckets) must forget the old
    corpus entirely (the r10 advice fix: explicit clear in the build)."""
    big = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    small = spark.createDataFrame([(9, "iota")], "doc_id long, text string")
    path = str(tmp_path / "rebuild")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        build_text_index(big, path, n_buckets=16)
        build_text_index(small, path, n_buckets=16)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # stale terms from the first build must be gone
    assert search_text_index(spark, path, ["alpha"], k=5).count() == 0
    assert [r["id"] for r in
            search_text_index(spark, path, ["iota"], k=5).collect()] == [9]
    # doclens reflects only the new corpus
    assert read_text_index_meta(path)["n_docs"] == 1


def test_doclens_broadcast_contract(spark, corpus, tmp_path, monkeypatch):
    """Plan contract (r9 verdict item #6 + r10 advice medium): with small
    pruned postings the candidate side broadcasts into the corpus-sized
    doclens join — doclens is never on the build side of an exchange —
    and when the pruned postings exceed the size gate the hard broadcast
    hint is ABSENT (AQE picks the strategy), so a stop-word query can
    never be forced through the broadcast limit."""
    import kaer_spark.operators.text_index as tix

    path = str(tmp_path / "tix_bc")
    build_text_index(corpus, path, n_buckets=16)

    small = search_text_index(spark, path, ["join"], k=3)
    plan = small._jdf.queryExecution().executedPlan().toString()
    # the doclens join is a broadcast join BUILDING the candidate (left)
    # side — doclens streams through it, so it is never shuffled (the only
    # hashpartitioning exchange in the plan is the bounded candidate pivot)
    assert "BroadcastHashJoin" in plan and "BuildLeft" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan

    monkeypatch.setattr(tix, "BROADCAST_POSTINGS_BYTES", 0)
    big = tix.search_text_index(spark, path, ["join"], k=3)
    opt = big._jdf.queryExecution().optimizedPlan().toString()
    # no user broadcast hint on the candidate side of the doclens join
    # once over the gate (the one-row pstats crossJoin hint remains —
    # that side is a single row by construction)
    assert "leftHint=(strategy=broadcast)" not in opt, opt
    small_opt = small._jdf.queryExecution().optimizedPlan().toString()
    assert "leftHint=(strategy=broadcast)" in small_opt, small_opt
    # results identical either way
    assert [tuple(r) for r in big.collect()] == [tuple(r) for r in small.collect()]


# --- positional phrase search ----------------------------------------------


def _py_phrase_count(text, phrase):
    toks = [t.lower() for t in text.strip().split()]
    ph = [t.lower() for t in phrase.split()]
    return sum(
        1
        for i in range(len(toks) - len(ph) + 1)
        if toks[i : i + len(ph)] == ph
    )


def test_phrase_search_matches_scan_counts(spark, corpus, tmp_path):
    from kaer_spark.operators.text_index import build_text_index, search_phrase

    path = str(tmp_path / "phr")
    build_text_index(corpus, path, n_buckets=8)
    rows = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for phrase in ("hash join", "scan scan", "join the hash", "spark", "no such"):
        got = {
            r["id"]: r["n_occurrences"]
            for r in search_phrase(spark, path, phrase).collect()
        }
        want = {
            i: _py_phrase_count(t, phrase)
            for i, t in rows.items()
            if _py_phrase_count(t, phrase) > 0
        }
        assert got == want, phrase
    # overlapping occurrences each count: "scan scan" in doc 4 -> 3
    assert (
        search_phrase(spark, path, "scan scan")
        .filter("id = 4").collect()[0]["n_occurrences"] == 3
    )
    # single-token phrase degenerates to tf
    assert (
        search_phrase(spark, path, "scan")
        .filter("id = 4").collect()[0]["n_occurrences"] == 4
    )


def test_phrase_terms_present_but_not_adjacent_excluded(spark, corpus, tmp_path):
    from kaer_spark.operators.text_index import build_text_index, search_phrase

    path = str(tmp_path / "phr2")
    build_text_index(corpus, path, n_buckets=8)
    # doc 2 has both "table" and "now" but not adjacent as "now table"
    assert search_phrase(spark, path, "now table").count() == 0
    # top-k ordering: count desc, id asc
    top = search_phrase(spark, path, "join", k=1).collect()
    assert top[0]["id"] == 1 and top[0]["n_occurrences"] == 2


def test_phrase_search_after_refresh(spark, corpus, tmp_path):
    from kaer_spark.operators.text_index import (
        build_text_index,
        refresh_text_index,
        search_phrase,
    )

    path = str(tmp_path / "phr3")
    build_text_index(corpus, path, n_buckets=8)
    late = spark.createDataFrame(
        [(9, "hash join hash join festival")], "doc_id long, text string"
    )
    refresh_text_index(late, path)
    got = {
        r["id"]: r["n_occurrences"]
        for r in search_phrase(spark, path, "hash join").collect()
    }
    assert got == {1: 1, 9: 2}


def test_phrase_search_requires_positional_index(spark, corpus, tmp_path):
    import json
    import os

    import pytest as _pytest

    from kaer_spark.operators.text_index import (
        META_FILE,
        build_text_index,
        search_phrase,
    )

    path = str(tmp_path / "phr4")
    build_text_index(corpus, path, n_buckets=8)
    meta = json.load(open(os.path.join(path, META_FILE)))
    meta.pop("positional")
    json.dump(meta, open(os.path.join(path, META_FILE), "w"))
    with _pytest.raises(ValueError, match="positional"):
        search_phrase(spark, path, "hash join")


def _py_near_count(text, terms, slop):
    toks = [t.lower() for t in text.strip().split()]
    terms = [t.lower() for t in terms]
    count = 0
    for p, tok in enumerate(toks):
        if tok != terms[0]:
            continue
        prev, ok = p, True
        for t in terms[1:]:
            nxt = [i for i in range(prev + 1, len(toks)) if toks[i] == t]
            if not nxt:
                ok = False
                break
            prev = nxt[0]
        if ok and prev - p <= len(terms) - 1 + slop:
            count += 1
    return count


def test_search_near_matches_python_and_phrase(spark, corpus, tmp_path):
    from kaer_spark.operators.text_index import (
        build_text_index,
        search_near,
        search_phrase,
    )

    path = str(tmp_path / "near")
    build_text_index(corpus, path, n_buckets=8)
    rows = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for terms, slop in (
        (["hash", "join"], 0),
        (["hash", "join"], 2),
        (["spark", "join"], 1),   # "spark shuffle join" needs slop >= 1
        (["spark", "join"], 0),
        (["join", "scan"], 3),
        (["scan", "scan"], 1),
    ):
        got = {
            r["id"]: r["n_matches"]
            for r in search_near(spark, path, terms, slop=slop).collect()
        }
        want = {
            i: _py_near_count(t, terms, slop)
            for i, t in rows.items()
            if _py_near_count(t, terms, slop) > 0
        }
        assert got == want, (terms, slop)
    # slop=0 == exact phrase, on every doc
    ph = {
        r["id"]: r["n_occurrences"]
        for r in search_phrase(spark, path, "hash join").collect()
    }
    nr = {
        r["id"]: r["n_matches"]
        for r in search_near(spark, path, ["hash", "join"], slop=0).collect()
    }
    assert ph == nr


def test_refresh_text_index_replay_after_crash(spark, tmp_path):
    """Crash-between-append-and-meta replay (r12 ADVICE class): the tail's
    postings/doclens landed but the watermark didn't — replaying the
    refresh must not duplicate postings or double-count n_docs/sum_dl."""
    import json
    import os

    from kaer_spark.operators.text_index import (
        META_FILE,
        read_text_index_meta,
        refresh_text_index,
    )

    rows = [
        (1, "spark shuffle join hash join broadcast"),
        (2, "join the hash table scan now"),
        (3, "completely unrelated words only here"),
        (4, "scan scan scan scan"),
        (5, "late arriving join document"),
        (6, "another late scan join text"),
    ]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    build_text_index(full.filter(F.col("doc_id") <= 4), inc_path)
    meta = refresh_text_index(full, inc_path)

    # wind the watermark (and incremental stats) back to the prefix state
    stale = dict(meta)
    stale["max_id"], stale["n_docs"] = 4, meta["n_docs"] - 2
    dl56 = 4 + 5  # doc 5 has 4 tokens, doc 6 has 5
    stale["sum_dl"] = meta["sum_dl"] - dl56
    with open(os.path.join(inc_path, META_FILE), "w") as f:
        json.dump(stale, f)
    replayed = refresh_text_index(full, inc_path)  # replay
    assert replayed["n_docs"] == 6 and replayed["sum_dl"] == meta["sum_dl"]
    assert read_text_index_meta(inc_path)["max_id"] == 6

    build_text_index(full, full_path)
    for terms in (["join"], ["late"], ["scan", "join"]):
        got = [
            (r["id"], r["bm25"])
            for r in search_text_index(spark, inc_path, terms, k=10).collect()
        ]
        want = [
            (r["id"], r["bm25"])
            for r in search_text_index(spark, full_path, terms, k=10).collect()
        ]
        assert got == want, terms


def test_refresh_replay_after_crash_between_appends(spark, tmp_path):
    """The OTHER crash window (r13 ADVICE, medium): postings append lands
    but the doclens append does NOT (postings write first in
    refresh_text_index) — a replay used to re-append those docs' postings
    because the doclens-based guard can't see them, doubling tf and df.
    Simulated exactly: run a real refresh, then delete the doclens files
    it added and wind the meta back — postings above the watermark, no
    doclens rows, stale stats. The replay must (a) NOT duplicate
    postings, (b) append the missing doclens rows, (c) heal the stats —
    every search result bit-equal to a clean full build."""
    import glob
    import json

    from kaer_spark.operators.text_index import (
        DOCLENS_DIR,
        META_FILE,
        refresh_text_index,
    )

    rows = [
        (1, "spark shuffle join hash join broadcast"),
        (2, "join the hash table scan now"),
        (3, "completely unrelated words only here"),
        (4, "scan scan scan scan"),
        (5, "late arriving join document"),
        (6, "another late scan join text"),
    ]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    build_text_index(full.filter(F.col("doc_id") <= 4), inc_path)
    dl_glob = os.path.join(inc_path, DOCLENS_DIR, "*")
    before = set(glob.glob(dl_glob))
    stale = read_text_index_meta(inc_path)
    meta = refresh_text_index(full, inc_path)

    # reproduce the crash state: postings for docs 5-6 are on disk, their
    # doclens files are not, and the sidecar still says max_id=4
    for f in set(glob.glob(dl_glob)) - before:
        os.remove(f)
    with open(os.path.join(inc_path, META_FILE), "w") as f:
        json.dump(stale, f)

    replayed = refresh_text_index(full, inc_path)  # the replay
    assert replayed["n_docs"] == 6 and replayed["sum_dl"] == meta["sum_dl"]
    assert replayed["max_id"] == 6

    # doclens healed without duplicates
    dl = spark.read.parquet(os.path.join(inc_path, DOCLENS_DIR))
    assert dl.count() == 6 and dl.select("id").distinct().count() == 6
    # postings not duplicated: distinct (term, id) == total rows
    post = spark.read.parquet(os.path.join(inc_path, "postings"))
    assert post.count() == post.select("term", "id").distinct().count()

    build_text_index(full, full_path)
    for terms in (["join"], ["scan", "join"], ["late"]):
        got = [
            (r["id"], r["bm25"])
            for r in search_text_index(spark, inc_path, terms, k=10).collect()
        ]
        want = [
            (r["id"], r["bm25"])
            for r in search_text_index(spark, full_path, terms, k=10).collect()
        ]
        assert got == want, terms


def test_text_index_stats_string_ids(spark, tmp_path):
    """String-keyed text index: watermark reported in the id's own type,
    staleness as is_stale (ordering), never an int() coercion."""
    from kaer_spark.operators.text_index import (
        build_text_index,
        text_index_stats,
    )

    docs = spark.createDataFrame(
        [
            ("u-01", "alpha beta gamma"),
            ("u-02", "beta gamma delta epsilon"),
        ],
        "doc_id string, text string",
    )
    path = str(tmp_path / "tix")
    build_text_index(docs, path, n_buckets=4)
    r = text_index_stats(spark, path, corpus=docs).collect()[0]
    assert r["watermark"] == "u-02" and r["is_stale"] is False
    assert "watermark_lag" not in r.asDict()
    live = docs.union(
        spark.createDataFrame(
            [("u-09", "zeta eta theta")], "doc_id string, text string"
        )
    )
    r2 = text_index_stats(spark, path, corpus=live).collect()[0]
    assert r2["is_stale"] is True
