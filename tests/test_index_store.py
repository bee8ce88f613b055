"""Materialized IVF index table: build / partition-pruned search /
incremental refresh (the reference's save / search / catch-up cycle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaer_spark.operators.index_store import (
    build_ivf_index,
    ivf_index_topk,
    read_index_meta,
    refresh_ivf_index,
)
from kaer_spark.operators.similarity import brute_force_topk, recall_at_k
from kaer_spark.plans.inspect import formatted_plan

QVEC = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]


def test_build_search_recall(spark, embeddings, tmp_path):
    path = str(tmp_path / "ivf")
    meta = build_ivf_index(embeddings, path, cells=8, seed=42)
    assert meta["dim"] == 64 and len(meta["centroids"]) == 8
    approx = ivf_index_topk(spark, path, QVEC, k=10, nprobe=4)
    exact = brute_force_topk(embeddings, QVEC, 10, metric="l2sq")
    assert approx.count() == 10
    assert recall_at_k(approx, exact, "vec_id") >= 0.5  # nprobe=4 of 8 cells


def test_search_prunes_partitions(spark, embeddings, tmp_path):
    """nprobe pruning must happen at the DIRECTORY level (PartitionFilters),
    not as a post-scan filter — that's what makes it an index."""
    path = str(tmp_path / "ivf")
    build_ivf_index(embeddings, path, cells=8, seed=42)
    df = ivf_index_topk(spark, path, QVEC, k=5, nprobe=2)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "_cell IN (" in plan or "_cell#" in plan  # pushed to partition level


def test_refresh_catches_up_from_max_id(spark, embeddings, tmp_path):
    path = str(tmp_path / "ivf")
    old = embeddings.filter(F.col("vec_id") < 300)
    build_ivf_index(old, path, cells=4, seed=42)
    assert read_index_meta(path)["max_id"] == 299

    meta = refresh_ivf_index(embeddings, path)
    assert meta["max_id"] == embeddings.agg(F.max("vec_id")).collect()[0][0]
    indexed = spark.read.parquet(f"{path}/data")
    assert indexed.count() == embeddings.count()
    # no duplicates: each id exactly once
    assert indexed.select("vec_id").distinct().count() == embeddings.count()
    # idempotent: second refresh appends nothing
    refresh_ivf_index(embeddings, path)
    assert spark.read.parquet(f"{path}/data").count() == embeddings.count()


def test_collection_index_lifecycle(spark, tmp_path):
    """Collection-level parity: build_index, approximate query through the
    probed cells, and insert-triggered catch-up (reference O4's inline
    index.Add becomes an id-range refresh job)."""
    import pytest

    from kaer_spark.context import CollectionNotFound, KaerContext

    ctx = KaerContext(spark, str(tmp_path / "kaer"))
    coll = ctx.create_collection("idx")
    coll.insert([f"document number {i} about topic {i % 5}" for i in range(40)],
                [{"topic": i % 5} for i in range(40)])

    with pytest.raises(CollectionNotFound):
        coll.query("topic 3", k=3, approximate=True)

    coll.build_index(cells=4, seed=42)
    exact = coll.query("topic 3", k=3).select("_m_id").collect()
    approx = coll.query("topic 3", k=3, approximate=True, nprobe=4)  # all cells
    assert [r["_m_id"] for r in approx.select("_m_id").collect()] == [
        r["_m_id"] for r in exact
    ]  # nprobe == cells → identical to exact

    # filtered approximate query respects the metadata pre-filter
    filtered = coll.query("topic 3", k=5, filter={"topic": 2}, approximate=True, nprobe=4)
    assert {r["topic"] for r in filtered.collect()} == {2}

    # insert auto-refreshes the index (catch-up from max_id)
    coll.insert(["a brand new document"], [{"topic": 9}])
    indexed = spark.read.parquet(f"{coll.index_path}/data")
    assert indexed.count() == 41


def test_indexed_collection_survives_schema_evolution(spark, tmp_path):
    """Insert-triggered refresh after a schema-evolving insert must leave
    the index queryable with filters on the NEW field (mergeSchema on the
    index read path)."""
    from kaer_spark.context import KaerContext

    ctx = KaerContext(spark, str(tmp_path / "kaer"))
    c = ctx.create_collection("evolving_idx")
    c.insert([f"base doc {i}" for i in range(10)], [{"a": i} for i in range(10)])
    c.build_index(cells=2, seed=42)
    c.insert(["fresh doc"], [{"a": 99, "b": "tagged"}])  # evolves schema + refreshes

    hit = c.query("fresh doc", k=3, filter={"b": "tagged"}, approximate=True, nprobe=2)
    rows = hit.collect()
    assert len(rows) == 1 and rows[0]["b"] == "tagged"
    # old rows remain queryable too, reading b as NULL
    allq = c.query("base doc", k=11, approximate=True, nprobe=2)
    assert allq.count() == 11


def test_deterministic_fit_is_oracle_replayable(spark, embeddings, tmp_path):
    """fit='deterministic': the stored centroids are exactly the cells
    smallest-id vectors, and a full-probe approximate search equals the
    exact top-k — the user-facing approximate mode a SQL oracle can replay
    bit-for-bit (VERDICT r5 stretch item)."""
    path = str(tmp_path / "ivf_det")
    meta = build_ivf_index(embeddings, path, cells=4, fit="deterministic")
    assert meta["fit"] == "deterministic"
    want = [
        [float(x) for x in r["embedding"]]
        for r in embeddings.orderBy("vec_id").limit(4).collect()
    ]
    assert meta["centroids"] == want
    # probing every cell degrades to exact search — same ids, same order
    approx = ivf_index_topk(spark, path, QVEC, k=10, nprobe=4)
    exact = brute_force_topk(embeddings, QVEC, 10, metric="l2sq")
    assert [r["vec_id"] for r in approx.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]
    # rebuild reproduces identical centroids (no RNG anywhere)
    meta2 = build_ivf_index(embeddings, str(tmp_path / "ivf_det2"), cells=4,
                            fit="deterministic")
    assert meta2["centroids"] == meta["centroids"]


def test_collection_deterministic_index_fit_survives_delete(spark, tmp_path):
    """Collection.build_index(fit='deterministic') flows through query
    (approximate=True), and the delete-triggered rebuild preserves the fit
    choice recorded in the sidecar."""
    from kaer_spark.context import KaerContext

    ctx = KaerContext(spark, str(tmp_path / "kaer"))
    ctx.create_collection("c")
    col = ctx.get_collection("c")
    col.insert([f"doc {i} alpha beta" for i in range(20)],
               [{"n": i} for i in range(20)])
    col.build_index(cells=4, fit="deterministic")
    assert read_index_meta(col.index_path)["fit"] == "deterministic"
    got = col.query("doc 3 alpha beta", k=3, approximate=True, nprobe=4)
    assert got.count() == 3
    col.delete({"n": {"$gte": 15}})
    meta = read_index_meta(col.index_path)
    assert meta["fit"] == "deterministic"
    assert col.query("doc 3 alpha beta", k=3, approximate=True).count() == 3


def test_index_knn_join_matches_fresh_join(spark, embeddings, tmp_path):
    """The index-table kNN join reuses the stored assignment + sidecar
    centroids, so it must equal a fresh ivf_knn_join over the raw corpus
    with the same (deterministic) centroids — and probing all cells must
    equal the exact broadcast knn_join."""
    from kaer_spark.operators.index_store import ivf_index_knn_join
    from kaer_spark.operators.knn import knn_join
    from kaer_spark.operators.similarity import ivf_knn_join

    path = str(tmp_path / "ivf_join")
    meta = build_ivf_index(embeddings, path, cells=4, fit="deterministic")
    queries = (
        embeddings.orderBy("vec_id").limit(15)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )

    def key_set(df):
        return {(r["query_id"], r["vec_id"], r["rank"]) for r in df.collect()}

    from_index = key_set(
        ivf_index_knn_join(spark, path, queries, k=5, nprobe=2)
    )
    fresh = key_set(
        ivf_knn_join(
            queries, embeddings, k=5, nprobe=2,
            corpus_id_col="vec_id", centroids=meta["centroids"],
        )
    )
    assert from_index == fresh
    exact = key_set(knn_join(queries, embeddings, k=5, corpus_id_col="vec_id"))
    assert key_set(ivf_index_knn_join(spark, path, queries, k=5, nprobe=4)) == exact


def test_bucketed_cell_table_join_no_corpus_shuffle(spark, embeddings, tmp_path):
    """The bucketed cell table: (a) results equal the path-index join,
    (b) with broadcast disabled (the huge-query regime), the shuffle join
    reads the corpus bucket-aligned — no Exchange on the corpus side below
    the join; only the query side shuffles on _cell."""
    from kaer_spark.operators.index_store import (
        ivf_index_knn_join,
        ivf_table_knn_join,
        write_ivf_bucketed_table,
    )
    from kaer_spark.plans import executed_plan

    meta_path = str(tmp_path / "ivf_tbl_meta")
    path = str(tmp_path / "ivf_path")
    try:
        write_ivf_bucketed_table(
            embeddings, "b_cells", meta_path, cells=4, fit="deterministic"
        )
        build_ivf_index(embeddings, path, cells=4, fit="deterministic")
        queries = (
            embeddings.orderBy("vec_id").limit(10)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        a = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in ivf_table_knn_join(
                spark, "b_cells", meta_path, queries, k=5, nprobe=2
            ).collect()
        }
        b = {
            (r["query_id"], r["vec_id"], r["rank"])
            for r in ivf_index_knn_join(spark, path, queries, k=5, nprobe=2).collect()
        }
        assert a == b and a

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = ivf_table_knn_join(spark, "b_cells", meta_path, queries, k=5, nprobe=2)
            plan = executed_plan(df)
            assert "BroadcastHashJoin" not in plan
            # exactly one _cell exchange (the query side); the bucketed
            # corpus scan feeds the join with no exchange of its own
            import re

            cell_exchanges = re.findall(
                r"Exchange hashpartitioning\(_cell", plan
            )
            assert len(cell_exchanges) == 1
            assert {(r["query_id"], r["vec_id"], r["rank"]) for r in df.collect()} == a
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_cells")


def test_filtered_query_escalates_nprobe(spark, embeddings, tmp_path):
    """A selective filter must return exactly k rows whenever k matches
    exist ANYWHERE in the index — nprobe doubles until filled or all
    cells probed, and the escalated result equals the exact filtered
    ranking (r9 verdict item #5: the reference's 'k nearest among
    matches', db/db.go:111-143, must hold under selective filters)."""
    path = str(tmp_path / "ivf_esc")
    build_ivf_index(embeddings, path, cells=8, seed=42)
    # a filter matching few rows, spread across cells: vec_id % 97 == 0
    pred = F.col("vec_id") % 97 == 0
    k = 5
    got = ivf_index_topk(spark, path, QVEC, k=k, nprobe=1, pred=pred)
    rows = got.collect()
    n_matches = embeddings.filter(pred).count()
    assert len(rows) == min(k, n_matches) and n_matches >= k
    # matches the exact filtered ranking (full probe ≡ exact over the
    # same rows, and escalation ends at full probe if needed)
    exact = (
        brute_force_topk(
            embeddings.filter(pred), QVEC, k, metric="l2sq"
        ).collect()
    )
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in exact]
    # escalation off reproduces the old under-filling probe
    off = ivf_index_topk(
        spark, path, QVEC, k=k, nprobe=1, pred=pred, escalate=False
    )
    assert off.count() <= len(rows)


# ---------------------------------------------------------------------------
# At-rest PQ code table (build / serve / catch-up — the PQ twin of the cycle
# above; reference db/db.go:102-109 persisted-index parity)
# ---------------------------------------------------------------------------
def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_pq_index_serves_identically_to_fresh_refined(spark, embeddings, tmp_path):
    """Serving from stored codes must be VALUE-identical to the per-call
    fit+encode path (same deterministic codebooks, same argmin codes, same
    ADC tables, same exact refine) — that identity is what lets the
    existing pq_knn_refined oracle keep checking the at-rest route."""
    from kaer_spark.operators.index_store import build_pq_index, pq_index_topk
    from kaer_spark.operators.similarity import pq_topk_refined

    path = str(tmp_path / "pq")
    meta = build_pq_index(embeddings, path, m=8, k=16)
    assert meta["kind"] == "pq" and meta["cells"] is None
    served = pq_index_topk(spark, path, embeddings, QVEC, topk=10, shortlist=50)
    fresh = pq_topk_refined(embeddings, QVEC, topk=10, shortlist=50, m=8, k=16)
    assert _rows(served) == _rows(fresh)


def test_pq_index_with_cells_matches_fresh_ivf_pq(spark, embeddings, tmp_path):
    from kaer_spark.operators.index_store import build_pq_index, pq_index_topk
    from kaer_spark.operators.similarity import ivf_pq_topk

    path = str(tmp_path / "ivfpq")
    build_pq_index(embeddings, path, m=8, k=16, cells=8)
    served = pq_index_topk(
        spark, path, embeddings, QVEC, topk=10, shortlist=50, nprobe=3
    )
    fresh = ivf_pq_topk(
        embeddings, QVEC, topk=10, cells=8, nprobe=3, shortlist=50,
        m=8, codebook_k=16,
    )
    assert _rows(served) == _rows(fresh)


def test_pq_refresh_catches_up_row_identical(spark, embeddings, tmp_path):
    """O8 catch-up for PQ: build on the id-prefix, refresh with the full
    corpus → the code table equals a from-scratch build over the SAME
    prefix-fit codebooks (refresh never refits), and refresh is idempotent
    per the id high-water mark."""
    from kaer_spark.operators.index_store import (
        build_pq_index,
        read_pq_meta,
        refresh_pq_index,
    )

    path = str(tmp_path / "pq")
    old = embeddings.filter(F.col("vec_id") < 300)
    build_pq_index(old, path, m=8, k=16)
    assert read_pq_meta(path)["max_id"] == 299

    meta = refresh_pq_index(embeddings, path)
    assert meta["max_id"] == embeddings.agg(F.max("vec_id")).collect()[0][0]
    codes = spark.read.parquet(f"{path}/data")
    assert codes.count() == embeddings.count()
    assert codes.select("vec_id").distinct().count() == embeddings.count()
    refresh_pq_index(embeddings, path)  # idempotent
    assert spark.read.parquet(f"{path}/data").count() == embeddings.count()

    # appended codes use the STORED (prefix-fit) codebooks: re-encoding the
    # tail fresh under those codebooks reproduces the stored rows exactly
    from kaer_spark.operators.similarity import pq_encode_deterministic

    tail_fresh = pq_encode_deterministic(
        embeddings.filter(F.col("vec_id") >= 300), meta["codebooks"]
    ).select("vec_id", "pq_code")
    stored_tail = codes.filter(F.col("vec_id") >= 300)
    assert sorted(_rows(tail_fresh.withColumn("pq_code", F.col("pq_code").cast("string")))) == sorted(
        _rows(stored_tail.withColumn("pq_code", F.col("pq_code").cast("string")))
    )


def test_pq_index_stage1_scans_codes_not_vectors(spark, embeddings, tmp_path):
    """The IO contract that justifies the index: the shortlist stage's
    parquet scan reads (id, pq_code) ONLY — never the raw vector column —
    and a probed search prunes code partitions at the directory level."""
    from kaer_spark.operators.index_store import build_pq_index, pq_index_topk

    path = str(tmp_path / "ivfpq")
    build_pq_index(embeddings, path, m=8, k=16, cells=8)
    df = pq_index_topk(spark, path, embeddings, QVEC, topk=5, shortlist=20, nprobe=2)
    plan = formatted_plan(df)
    # two scans: codes (no embedding column) + corpus (for the exact refine)
    import re

    code_scans = [
        s for s in re.findall(r"ReadSchema: [^\n]*", plan) if "pq_code" in s
    ]
    assert code_scans, plan
    assert all("embedding" not in s for s in code_scans), code_scans
    assert "PartitionFilters" in plan


def test_collection_pq_index_lifecycle(spark, tmp_path):
    """Collection-level PQ serving: build the code table, query from it
    (equals the operator-level refined search over the same frame), stats
    reflect it, and insert → refresh_pq_index catches up so the new doc
    is findable through the compressed path."""
    from kaer_spark.context import KaerContext
    from kaer_spark.operators.similarity import pq_topk_refined

    ctx = KaerContext(spark, str(tmp_path / "kaer"))
    coll = ctx.create_collection("pq")
    texts = [f"document number {i} about topic {i % 7}" for i in range(40)]
    coll.insert(texts, [{"i": i} for i in range(40)])
    assert coll.stats()["has_pq_index"] is False

    coll.build_pq_index(m=8, k=16)
    assert coll.stats()["has_pq_index"] is True
    got = coll.query_pq("topic three", k=5, shortlist=20).collect()
    assert len(got) == 5
    # parity with the operator-level fresh computation on the same frame
    from kaer_spark.context import EMB_COL, ID_COL
    from kaer_spark.embeddings import embed_texts_local

    qv = embed_texts_local(["topic three"], ctx.provider_for(coll.meta))[0]
    fresh = pq_topk_refined(
        coll.df(), qv, topk=5, shortlist=20, m=8, k=16,
        vec_col=EMB_COL, id_col=ID_COL,
    ).collect()
    assert [r[ID_COL] for r in got] == [r[ID_COL] for r in fresh]
    assert [r["_dist"] for r in got] == [r["_score"] for r in fresh]

    # catch-up: new inserts become searchable after refresh
    coll.insert(["a brand new document"], [{"i": 99}])
    coll.refresh_pq_index()
    ids = {
        r[ID_COL]
        for r in coll.query_pq(
            "a brand new document", k=41, shortlist=100
        ).collect()
    }
    assert coll.count() - 1 in ids  # the appended doc's id is served


def test_refresh_replayed_after_crash_no_duplicates(spark, embeddings, tmp_path):
    """Crash-between-append-and-meta (r12 ADVICE): a successful tail append
    whose watermark update never landed leaves the meta stale; replaying
    the refresh must NOT duplicate ids in the code table or in served
    top-k. Simulated by resetting max_id back to the prefix value."""
    import json
    import os

    from kaer_spark.operators.index_store import (
        PQ_META_FILE,
        build_pq_index,
        pq_index_topk,
        read_pq_meta,
        refresh_pq_index,
    )

    path = str(tmp_path / "pq")
    build_pq_index(embeddings.filter(F.col("vec_id") < 300), path, m=8, k=16)
    refresh_pq_index(embeddings, path)
    total = embeddings.count()
    assert spark.read.parquet(f"{path}/data").count() == total

    # wind the watermark back as if the meta write was lost
    meta = read_pq_meta(path)
    meta["max_id"] = 299
    with open(os.path.join(path, PQ_META_FILE), "w") as f:
        json.dump(meta, f)
    refresh_pq_index(embeddings, path)  # replay
    codes = spark.read.parquet(f"{path}/data")
    assert codes.count() == total
    assert codes.select("vec_id").distinct().count() == total
    assert read_pq_meta(path)["max_id"] == embeddings.agg(
        F.max("vec_id")
    ).collect()[0][0]
    served = pq_index_topk(spark, path, embeddings, QVEC, topk=10, shortlist=50)
    ids = [r["vec_id"] for r in served.collect()]
    assert len(ids) == len(set(ids)) == 10


def test_ivf_refresh_replayed_after_crash_no_duplicates(spark, embeddings, tmp_path):
    import json
    import os

    from kaer_spark.operators.index_store import META_FILE

    path = str(tmp_path / "ivf")
    build_ivf_index(embeddings.filter(F.col("vec_id") < 300), path, cells=4, seed=42)
    refresh_ivf_index(embeddings, path)
    total = embeddings.count()
    meta = read_index_meta(path)
    meta["max_id"] = 299
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(meta, f)
    refresh_ivf_index(embeddings, path)  # replay
    data = spark.read.parquet(f"{path}/data")
    assert data.count() == total
    assert data.select("vec_id").distinct().count() == total


def test_pq_index_topk_filtered_k_nearest_among_matches(spark, embeddings, tmp_path):
    """pred semi-joins the code table BEFORE the ADC cut: with a shortlist
    covering every match, the result IS the exact filtered top-k ("k
    nearest among matches"), never an under-filled top-k-minus-rest."""
    from kaer_spark.operators.index_store import build_pq_index, pq_index_topk
    from kaer_spark.operators.similarity import brute_force_topk

    path = str(tmp_path / "pq")
    build_pq_index(embeddings, path, m=8, k=16)
    pred = F.col("vec_id") % 7 == 0
    n_match = embeddings.filter(pred).count()
    got = pq_index_topk(
        spark, path, embeddings, QVEC, topk=10,
        shortlist=n_match, pred=pred,
    ).collect()
    exact = (
        brute_force_topk(
            embeddings.filter(pred), QVEC, 10, metric="l2sq"
        )
        .collect()
    )
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    assert all(r["vec_id"] % 7 == 0 for r in got)


def test_pq_index_topk_filtered_escalates_nprobe(spark, embeddings, tmp_path):
    """Celled index + selective pred: a 1-cell probe can't fill k, so
    nprobe doubles until k rows match (the ivf_index_topk recipe) — and
    at full escalation the result equals the unprobed filtered search."""
    from kaer_spark.operators.index_store import build_pq_index, pq_index_topk

    path = str(tmp_path / "pq")
    build_pq_index(embeddings, path, m=8, k=16, cells=8)
    pred = F.col("vec_id") % 50 == 0  # ~12 matches spread across cells
    k = 8
    esc = pq_index_topk(
        spark, path, embeddings, QVEC, topk=k, shortlist=200,
        nprobe=1, pred=pred, escalate=True,
    ).collect()
    assert len(esc) == k
    assert all(r["vec_id"] % 50 == 0 for r in esc)
    flat = pq_index_topk(
        spark, path, embeddings, QVEC, topk=k, shortlist=200,
        pred=pred,
    ).collect()
    assert [(r["vec_id"], r["_score"]) for r in esc] == [
        (r["vec_id"], r["_score"]) for r in flat
    ]
    # without escalation the 1-cell probe under-fills
    une = pq_index_topk(
        spark, path, embeddings, QVEC, topk=k, shortlist=200,
        nprobe=1, pred=pred, escalate=False,
    ).collect()
    assert len(une) < k


def test_collection_query_pq_filtered(spark, tmp_path):
    """query_pq(filter=...) is the reference's filtered-kNN contract on the
    compressed path: every hit matches the Mongo-dialect filter and equals
    query()'s exact filtered ranking when the shortlist covers the
    matches."""
    from kaer_spark.context import ID_COL, KaerContext

    ctx = KaerContext(spark, str(tmp_path / "kaer"))
    coll = ctx.create_collection("pqf")
    texts = [f"document number {i} about topic {i % 7}" for i in range(40)]
    coll.insert(texts, [{"i": i, "parity": i % 2} for i in range(40)])
    coll.build_pq_index(m=8, k=16)
    got = coll.query_pq(
        "topic three", k=5, filter={"parity": 1}, shortlist=40
    ).collect()
    assert len(got) == 5
    assert all(r["parity"] == 1 for r in got)
    exact = coll.query("topic three", k=5, filter={"parity": 1}).collect()
    assert [r[ID_COL] for r in got] == [r[ID_COL] for r in exact]


def test_ivf_table_hard_negatives_no_corpus_exchange(spark, embeddings, tmp_path):
    """Mining from the bucketed cell table: full probe equals the exact
    broadcast miner (same exclusions), and with broadcast disabled the
    corpus side feeds the cell join bucket-aligned — zero corpus-side
    exchange, the recurring-epoch mining layout."""
    import re

    from kaer_spark.operators.index_store import (
        ivf_table_hard_negatives,
        write_ivf_bucketed_table,
    )
    from kaer_spark.operators.knn import hard_negatives
    from kaer_spark.plans import executed_plan

    meta_path = str(tmp_path / "hn_tbl_meta")
    try:
        write_ivf_bucketed_table(
            embeddings, "hn_cells", meta_path, cells=4, fit="deterministic"
        )
        queries = (
            embeddings.orderBy("vec_id").limit(4)
            .select(F.col("vec_id").alias("query_id"), "embedding")
        )
        ex = spark.createDataFrame(
            [(q, q + 3) for q in range(4)], "query_id long, vec_id long"
        )
        kwargs = dict(
            metric="l2sq", exclude_pairs=ex, exclude_self=True,
        )
        exact = hard_negatives(
            queries,
            embeddings.select(F.col("vec_id"), "embedding"),
            k=5, corpus_id_col="vec_id", **kwargs,
        )
        mined = ivf_table_hard_negatives(
            spark, "hn_cells", meta_path, queries, k=5, nprobe=4, **kwargs
        )
        assert sorted(map(tuple, exact.collect())) == sorted(
            map(tuple, mined.collect())
        )

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = ivf_table_hard_negatives(
                spark, "hn_cells", meta_path, queries, k=5, nprobe=2, **kwargs
            )
            plan = executed_plan(df)
            assert "BroadcastHashJoin" not in plan
            assert "BroadcastNestedLoopJoin" not in plan
            cell_exchanges = re.findall(r"Exchange hashpartitioning\(_cell", plan)
            assert len(cell_exchanges) == 1  # query side only
            assert df.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS hn_cells")


def test_pq_index_knn_join_equals_per_query_serving(spark, embeddings, tmp_path):
    """The batch join must reproduce the single-query pq_index_topk loop
    exactly — per query, same survivors, same exact re-rank scores — for
    both the unprobed and the celled+probed layouts."""
    from kaer_spark.operators.index_store import (
        build_pq_index,
        pq_index_knn_join,
        pq_index_topk,
    )

    queries = (
        embeddings.orderBy("vec_id").limit(4)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    qvecs = {r["query_id"]: list(r["embedding"]) for r in queries.collect()}

    for cells, nprobe in ((None, None), (8, 3)):
        path = str(tmp_path / f"pq_{cells}")
        build_pq_index(embeddings, path, m=8, k=16, cells=cells)
        batch = pq_index_knn_join(
            spark, path, embeddings, queries,
            topk=5, shortlist=20, nprobe=nprobe,
        ).collect()
        got = {}
        for r in batch:
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["vec_id"], r["_score"])
            )
        assert set(got) == set(qvecs)
        for qid, qv in qvecs.items():
            single = [
                (i + 1, r["vec_id"], r["_score"])
                for i, r in enumerate(
                    pq_index_topk(
                        spark, path, embeddings, qv,
                        topk=5, shortlist=20, nprobe=nprobe,
                    ).collect()
                )
            ]
            assert sorted(got[qid]) == single, (cells, qid)


def test_pq_index_knn_join_filtered(spark, embeddings, tmp_path):
    """Filtered batch join: every hit matches pred, and with a shortlist
    covering all matches each query's result is the exact filtered top-k."""
    from kaer_spark.operators.index_store import (
        build_pq_index,
        pq_index_knn_join,
    )
    from kaer_spark.operators.similarity import brute_force_topk

    path = str(tmp_path / "pq")
    build_pq_index(embeddings, path, m=8, k=16)
    pred = F.col("vec_id") % 9 == 0
    n_match = embeddings.filter(pred).count()
    queries = (
        embeddings.orderBy("vec_id").limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    out = pq_index_knn_join(
        spark, path, embeddings, queries,
        topk=6, shortlist=n_match, pred=pred,
    ).collect()
    by_q = {}
    for r in out:
        assert r["vec_id"] % 9 == 0
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    qvecs = {r["query_id"]: list(r["embedding"]) for r in queries.collect()}
    for qid, qv in qvecs.items():
        exact = brute_force_topk(
            embeddings.filter(pred), qv, 6, metric="l2sq"
        ).collect()
        assert sorted(by_q[qid]) == [
            (i + 1, r["vec_id"]) for i, r in enumerate(exact)
        ]


def test_pq_index_knn_join_unprobed_guard(spark, embeddings, tmp_path):
    """The unprobed branch broadcasts + crosses the query table with the
    code scan — fine for eval-sized batches, a blow-up for training-sized
    ones. The row-count gate raises past max_unprobed_queries with
    nprobe=None (r13 verdict #3: geometry guards beat docstrings); the
    same batch passes with nprobe on a celled index, and raising the knob
    deliberately also passes."""
    import pytest as _pytest

    from kaer_spark.operators.index_store import (
        build_pq_index,
        pq_index_knn_join,
    )

    path = str(tmp_path / "pq_guard")
    build_pq_index(embeddings, path, m=8, k=16, cells=8)
    queries = embeddings.limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with _pytest.raises(ValueError, match="max_unprobed_queries"):
        pq_index_knn_join(
            spark, path, embeddings, queries,
            topk=3, shortlist=10, max_unprobed_queries=5,
        )
    # celled + probed: no guard (queries equi-join on _cell, never cross)
    probed = pq_index_knn_join(
        spark, path, embeddings, queries,
        topk=3, shortlist=10, nprobe=8, max_unprobed_queries=5,
    )
    assert probed.count() == 30
    # deliberate override
    forced = pq_index_knn_join(
        spark, path, embeddings, queries,
        topk=3, shortlist=10, max_unprobed_queries=10,
    )
    assert forced.count() == 30


def test_ivf_index_stats_health_report(spark, tmp_path):
    """Index-health report: per-cell sizes, skew vs the balanced design
    point, rank-based residual quantiles against the sidecar centroids,
    watermark lag vs a live corpus that grew past the index, and the
    oversized flag after a drift-shaped refresh piles everything onto
    one cell."""
    from kaer_spark.operators.index_store import (
        build_ivf_index,
        ivf_index_stats,
        refresh_ivf_index,
    )

    # det fit, cells=4: centroids = vectors of ids 0..3 (spread corners)
    cents = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]]
    rows = [(i, c) for i, c in enumerate(cents)]
    rows += [(4, [1.0, 0.0])]                                  # cell 0
    rows += [(10 + i, [10.0, float(i + 1)]) for i in range(5)]  # cell 1
    rows += [(20, [0.0, 9.0]), (21, [10.0, 9.0])]              # cells 2, 3
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    build_ivf_index(corpus, path, cells=4, fit="deterministic")
    live = corpus.union(
        spark.createDataFrame([(99, [0.0, 0.0])], corpus.schema)
    )
    stats = {
        r["cell"]: r
        for r in ivf_index_stats(spark, path, corpus=live).collect()
    }
    assert [stats[c]["n_vectors"] for c in range(4)] == [2, 6, 2, 2]
    assert abs(stats[0]["size_frac"] - 2 / 12) < 1e-15
    assert abs(stats[1]["skew"] - 6 * 4 / 12) < 1e-15  # 2.0
    # skew uses a strict > 2.0 bar: exactly 2.0 is NOT flagged
    assert not stats[1]["oversized"]
    # cell 0 residuals {0.0, 1.0}: p50 = rank ceil(2/2)=1 → 0.0,
    # p90 = rank ceil(1.8)=2 → 1.0
    assert stats[0]["p50_resid"] == 0.0 and stats[0]["p90_resid"] == 1.0
    # cell 1 residuals {0,1,4,9,16,25}: p50 = rank 3 → 4.0, p90 = rank 6
    assert stats[1]["p50_resid"] == 4.0 and stats[1]["p90_resid"] == 25.0
    assert stats[1]["max_resid"] == 25.0
    assert stats[0]["watermark"] == 21 and stats[0]["watermark_lag"] == 78

    # drift-shaped refresh: 12 new vectors all land in cell 1 → its skew
    # rises past the 2.0 bar and the report flags it
    tail = spark.createDataFrame(
        [(200 + i, [10.0, 0.5]) for i in range(12)], corpus.schema
    )
    refresh_ivf_index(corpus.union(tail), path)
    stats2 = {r["cell"]: r for r in ivf_index_stats(spark, path).collect()}
    assert stats2[1]["n_vectors"] == 18
    assert stats2[1]["oversized"]  # 18*4/24 = 3.0 > 2.0
    assert not stats2[0]["oversized"]
    assert "watermark_lag" not in stats2[0].asDict()  # corpus not given


def test_pq_index_stats_reconstruction_error(spark, tmp_path):
    """PQ health report: reconstruction error of the STORED codes against
    the sidecar codebooks. Vectors that are exact codebook-slice
    combinations reconstruct at 0; a known off-by-delta vector carries
    exactly delta² per perturbed dim; watermark lag reflects a corpus
    that grew past the index."""
    from kaer_spark.operators.index_store import (
        build_pq_index,
        pq_index_stats,
    )

    # m=2 subspaces of d=2; det codebooks = slices of ids 0,1 (k=2)
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [4.0, 0.0, 0.0, 4.0]),
        (2, [4.0, 0.0, 0.0, 0.0]),   # book0[1] ++ book1[0] → exact
        (3, [0.1, 0.0, 0.0, 0.0]),   # 0.1 off book0[0] in dim 1
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "pq")
    build_pq_index(corpus, path, m=2, k=2, cells=None, fit="deterministic")
    live = corpus.union(
        spark.createDataFrame([(50, [0.0] * 4)], corpus.schema)
    )
    row = pq_index_stats(spark, path, live).collect()
    assert len(row) == 1 and row[0]["cell"] == -1
    r = row[0]
    assert r["n_codes"] == 4
    # errors: ids 0,1,2 → 0.0; id 3 → 0.1² = 0.01
    assert r["p50_err"] == 0.0                      # rank ceil(4/2)=2
    assert abs(r["p90_err"] - 0.01) < 1e-15         # rank ceil(3.6)=4
    assert abs(r["max_err"] - 0.01) < 1e-15
    assert r["watermark"] == 3 and r["watermark_lag"] == 47
