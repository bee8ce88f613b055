"""Materialized vector-index tables: the Spark-native replacement for the
reference's HNSW save/load/catch-up cycle.

Reference parity (SURVEY.md §2.1): kaer checkpoints its in-RAM graph to
``{dir}/index/{collection}_{id}.hnsw`` plus a meta row ``(collection,
file, last_id, size)`` (``/root/reference/db/db.go:102-109``,
``db/meta.go:11-28``), and on reopen replays vectors with
``_m_id > checkpoint`` into the graph (``db/db.go:191-207``). Here the
"index" is an IVF layout on disk:

* **build** — fit a k-means coarse quantizer (MLlib), assign every vector
  to its nearest centroid *with a pure Catalyst argmin* (array of (dist,
  cell) structs → ``array_min``; narrow, no shuffle), write parquet
  partitioned by cell, record ``{centroids, cells, dim, seed, max_id}`` in
  an ``index.json`` sidecar (the meta row).
* **search** — pick the ``nprobe`` nearest cells driver-side from the tiny
  sidecar centroids, scan only those cell partitions (directory-level
  partition pruning — verified in tests), exact-rank inside.
* **refresh** — the catch-up scan: append vectors with ``id > meta.max_id``
  to their cells using the *stored* centroids (no refit), update the
  sidecar. Incremental, idempotent per id high-water mark.

At 100 TB the cell count scales up (√N cells is the usual rule); build is
one narrow pass + a partitioned write, search touches ``nprobe/cells`` of
the data, refresh touches only the id-range tail (which id-block file
clustering makes a file-pruned scan).
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaer_spark.functions.vector import (
    double_matrix_lit,
    double_nested_lit,
    l2sq,
)

META_FILE = "index.json"
DATA_DIR = "data"


def _write_meta_atomic(path: str, filename: str, meta: dict) -> None:
    """Sidecar meta writes are tmp + ``os.replace`` (the
    ``Collection._save_meta`` pattern): a crash mid-write can never leave
    a truncated JSON, and the watermark flip is a single atomic op."""
    os.makedirs(path, exist_ok=True)
    target = os.path.join(path, filename)
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, target)


def _refresh_replay_guard(tail: DataFrame, path: str, meta: dict) -> DataFrame:
    """Make a replayed catch-up harmless: a crash AFTER a successful tail
    append but BEFORE the meta watermark update leaves rows on disk with
    ``id > meta.max_id``; re-encoding the same tail would duplicate ids in
    the index table (and in served top-k). Anti-join the tail against the
    ids already present above the watermark — an id-column-only,
    predicate-pushed scan of the index table, not the corpus — so the
    replay appends exactly the missing rows (usually none)."""
    id_col = meta["id_col"]
    spark = tail.sparkSession
    existing = (
        spark.read.parquet(os.path.join(path, DATA_DIR))
        .select(id_col)
        .filter(F.col(id_col) > meta["max_id"])
    )
    return tail.join(existing, [id_col], "left_anti")


def _assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
) -> DataFrame:
    """Nearest-centroid id per row as a narrow expression: build the
    (distance, cell) struct array and take ``array_min`` (struct ordering
    compares distance first, then cell — deterministic ties)."""
    pairs = F.array(
        *[
            F.struct(l2sq(vec_col, c).alias("d"), F.lit(i).alias("c"))
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn("_cell", F.array_min(pairs)["c"])


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cells: int = 16,
    seed: int = 42,
    fit: str = "kmeans",
) -> dict:
    """Build the index table at ``path`` and return its meta dict.

    ``fit`` picks the coarse quantizer: ``"kmeans"`` (MLlib — best cell
    balance/recall, but iterated float sums can't replay in a SQL oracle),
    ``"deterministic"`` (smallest-id sample centroids,
    ``similarity.ivf_fit_deterministic`` — bit-exact replayable end to
    end, so an approximate ``query()`` over this index is itself
    oracle-checkable), or ``"spread"`` (hash-ordered sample,
    ``similarity.ivf_fit_spread`` — equally replayable, decorrelated from
    ingestion order for better cell balance). Search and refresh are fit-agnostic: both read the
    stored centroid literals from the sidecar.
    """
    if fit == "deterministic":
        from kaer_spark.operators.similarity import ivf_fit_deterministic

        centroids = ivf_fit_deterministic(
            corpus, vec_col=vec_col, id_col=id_col, cells=cells
        )
    elif fit == "spread":
        from kaer_spark.operators.similarity import ivf_fit_spread

        centroids = ivf_fit_spread(
            corpus, vec_col=vec_col, id_col=id_col, cells=cells
        )
    elif fit == "kmeans":
        from kaer_spark.operators.similarity import ivf_fit

        model = ivf_fit(corpus, vec_col=vec_col, cells=cells, seed=seed)
        centroids = [[float(x) for x in c] for c in model.clusterCenters()]
    else:
        raise ValueError(
            f"unknown fit {fit!r}: use 'kmeans', 'deterministic', or 'spread'"
        )
    assigned = _assign_cells(corpus, centroids, vec_col)
    assigned.write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(path, DATA_DIR)
    )
    max_id = corpus.agg(F.max(id_col)).collect()[0][0]
    meta = {
        "cells": cells,
        "dim": len(centroids[0]),
        "seed": seed,
        "fit": fit,
        "id_col": id_col,
        "vec_col": vec_col,
        "max_id": int(max_id) if max_id is not None else -1,
        "centroids": centroids,
    }
    _write_meta_atomic(path, META_FILE, meta)
    return meta


def read_index_meta(path: str) -> dict:
    with open(os.path.join(path, META_FILE)) as f:
        return json.load(f)


def refresh_ivf_index(corpus: DataFrame, path: str) -> dict:
    """Catch-up (reference O8, ``updateIndexFromLastId``): append vectors
    with ``id > meta.max_id`` to their cells using the stored centroids."""
    meta = read_index_meta(path)
    tail = corpus.filter(F.col(meta["id_col"]) > meta["max_id"])
    new_max = tail.agg(F.max(meta["id_col"])).collect()[0][0]
    if new_max is None:
        return meta  # nothing to replay
    tail = _refresh_replay_guard(tail, path, meta)
    assigned = _assign_cells(tail, meta["centroids"], meta["vec_col"])
    assigned.write.mode("append").partitionBy("_cell").parquet(
        os.path.join(path, DATA_DIR)
    )
    meta["max_id"] = int(new_max)
    _write_meta_atomic(path, META_FILE, meta)
    return meta


def write_ivf_bucketed_table(
    corpus: DataFrame,
    table: str,
    meta_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cells: int = 16,
    fit: str = "spread",
) -> dict:
    """Materialize the cell-assigned corpus as a CATALOG TABLE bucketed by
    ``_cell`` — the zero-corpus-shuffle layout for RECURRING kNN joins.

    The path-based index (``build_ivf_index``) prunes single-query probes
    by partition directory; for the JOIN workload the relevant cost is the
    cell equi-join's corpus-side exchange once the query side outgrows a
    broadcast (AQE falls back to a shuffle join). Bucketing the table on
    ``_cell`` records the hash distribution in the catalog, so that join
    reads the corpus bucket-aligned with NO exchange below the join — only
    the (small) query side shuffles. Centroids and geometry go to the
    ``meta_path`` sidecar, same format as the path index.
    """
    from kaer_spark.operators.similarity import (
        ivf_fit_deterministic,
        ivf_fit_spread,
    )
    from kaer_spark.sources.files import write_bucketed

    if fit == "spread":
        centroids = ivf_fit_spread(corpus, vec_col, id_col, cells)
    elif fit == "deterministic":
        centroids = ivf_fit_deterministic(corpus, vec_col, id_col, cells)
    else:
        raise ValueError(f"unknown fit {fit!r}: use 'spread' or 'deterministic'")
    assigned = _assign_cells(corpus, centroids, vec_col)
    write_bucketed(assigned, table, ["_cell"], num_buckets=cells, sort_by=[id_col])
    meta = {
        "cells": cells,
        "dim": len(centroids[0]),
        "fit": fit,
        "id_col": id_col,
        "vec_col": vec_col,
        "table": table,
        "centroids": centroids,
    }
    _write_meta_atomic(meta_path, META_FILE, meta)
    return meta


def ivf_table_knn_join(
    spark: SparkSession,
    table: str,
    meta_path: str,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    pred=None,
) -> DataFrame:
    """kNN join against the BUCKETED cell table written by
    :func:`write_ivf_bucketed_table`: the corpus side of the cell
    equi-join carries no exchange (bucket-aligned scan) even when the
    query side is too large to broadcast — plan-asserted in
    ``tests/test_index_store.py``."""
    from kaer_spark.operators.similarity import ivf_knn_join

    meta = read_index_meta(meta_path)
    return ivf_knn_join(
        queries,
        spark.table(table),
        k,
        nprobe=nprobe,
        query_vec_col=query_vec_col,
        corpus_vec_col=meta["vec_col"],
        query_id_col=query_id_col,
        corpus_id_col=meta["id_col"],
        centroids=meta["centroids"],
        corpus_pred=pred,
    )


def ivf_table_hard_negatives(
    spark: SparkSession,
    table: str,
    meta_path: str,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    metric: str = "cosine",
    exclude_pairs: DataFrame | None = None,
    exclude_self: bool = True,
    dup_ceiling: float | None = None,
    pred=None,
) -> DataFrame:
    """Hard-negative mining against the BUCKETED cell table — the standing
    serving layout for a RECURRING mining pass (every contrastive-training
    epoch re-mines as the encoder moves): ``knn.ivf_hard_negatives``'s
    exclusion semantics with the corpus side of the cell equi-join
    carrying NO exchange at all (bucket-aligned scan; only the
    nprobe×-replicated query side shuffles). Reuses the table's stored
    ``_cell`` assignment and the sidecar centroids, so mining never
    recomputes a corpus argmin. Same caveat as the table join: don't
    probe an L2-assigned layout by angle — build the table with the
    metric the miner will use. ``pred`` restricts the candidate pool
    (filtered mining — same contract as ``knn.ivf_hard_negatives``'s
    ``corpus_pred``), pushed into the bucket-aligned scan."""
    from kaer_spark.operators.knn import ivf_hard_negatives

    meta = read_index_meta(meta_path)
    return ivf_hard_negatives(
        queries,
        spark.table(table),
        k,
        cells=meta["cells"],
        nprobe=nprobe,
        query_vec_col=query_vec_col,
        corpus_vec_col=meta["vec_col"],
        query_id_col=query_id_col,
        corpus_id_col=meta["id_col"],
        centroids=meta["centroids"],
        metric=metric,
        exclude_pairs=exclude_pairs,
        exclude_self=exclude_self,
        dup_ceiling=dup_ceiling,
        corpus_pred=pred,
    )


def ivf_index_knn_join(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    nprobe: int = 4,
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    pred=None,
) -> DataFrame:
    """kNN JOIN against the materialized index table: the many-queries form
    of :func:`ivf_index_topk`, for query sides too large to loop (or to
    broadcast — see ``operators.similarity.ivf_knn_join``, which this
    wraps). Reuses the table's stored cell assignment — the corpus never
    recomputes a centroid argmin per join — and the sidecar centroid
    literals for query-side probing, so results match a fresh
    ``ivf_knn_join`` built with the same centroids exactly. ``pred``
    applies the metadata pre-filter inside the probed corpus (filtered
    batch ANN, same semantics as :func:`ivf_index_topk`)."""
    from kaer_spark.operators.similarity import ivf_knn_join

    meta = read_index_meta(path)
    corpus = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, DATA_DIR)
    )
    return ivf_knn_join(
        queries,
        corpus,
        k,
        nprobe=nprobe,
        query_vec_col=query_vec_col,
        corpus_vec_col=meta["vec_col"],
        query_id_col=query_id_col,
        corpus_id_col=meta["id_col"],
        centroids=meta["centroids"],
        corpus_pred=pred,
    )


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    query_vector: Sequence[float],
    k: int,
    nprobe: int = 4,
    pred=None,
    escalate: bool = True,
) -> DataFrame:
    """Search the materialized index: prune to the ``nprobe`` nearest cell
    partitions, exact-rank inside them (ascending l2sq, id tie-break).
    ``pred`` (a boolean Column) applies the metadata pre-filter inside the
    probed cells — the reference's filtered-ANN semantics.

    ``escalate`` (default True) upholds the reference's "k nearest among
    matches" contract (``db/db.go:111-143``) under SELECTIVE filters: when
    the filtered probe set fills fewer than ``k`` rows, ``nprobe`` doubles
    until ``k`` rows match or every cell is probed (full probe ≡ the exact
    filtered query over the index table) — without it a selective filter
    silently under-fills even when k matches exist in unprobed cells.
    Each escalation check is one bounded count over the pruned scan; the
    common case (filter matches ≥ k in the first probe set) pays exactly
    one such check. Unfiltered queries keep the classic fixed-``nprobe``
    recall trade (escalation would only trigger when the probed cells
    hold fewer than k rows outright)."""
    meta = read_index_meta(path)
    q = [float(x) for x in query_vector]
    dists = [
        (i, sum((a - b) * (a - b) for a, b in zip(c, q)))
        for i, c in enumerate(meta["centroids"])
    ]
    order = [i for i, _ in sorted(dists, key=lambda t: (t[1], t[0]))]
    n_cells = len(order)
    # mergeSchema: refresh appends after collection schema evolution may
    # carry fields the original build files lack (same reason Collection.df
    # merges); without it a filtered approximate query can fail to resolve
    # the predicate column or read it inconsistently.
    df = spark.read.option("mergeSchema", "true").parquet(os.path.join(path, DATA_DIR))
    cur = max(1, min(int(nprobe), n_cells))
    while True:
        pruned = df.filter(F.col("_cell").isin(order[:cur]))
        if pred is not None:
            pruned = pruned.filter(pred)
        out = (
            pruned.withColumn("_score", l2sq(meta["vec_col"], q))
            .orderBy(F.col("_score").asc(), F.col(meta["id_col"]).asc())
            .limit(k)
        )
        if pred is None or not escalate or cur >= n_cells:
            return out
        if out.count() >= k:
            return out
        cur = min(cur * 2, n_cells)


# ---------------------------------------------------------------------------
# At-rest PQ code tables: the compressed-serving twin of the IVF index above.
# ---------------------------------------------------------------------------
PQ_META_FILE = "pq_index.json"


def build_pq_index(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    cells: int | None = None,
    fit: str = "deterministic",
    seed: int = 42,
    extra_meta: dict | None = None,
) -> dict:
    """Materialize the PQ code table at ``path`` — the reference's
    persisted-index cycle (``/root/reference/db/db.go:102-109``, O10/O16)
    for PRODUCT-QUANTIZED serving: codes are fit + encoded ONCE at build
    and every query thereafter reads only the ``(id, pq_code[, _cell])``
    columns — m ints per vector instead of ``dim`` floats (32× less IO at
    m=8 / dim=64 float32). Without this, every ``pq_topk_refined`` call
    re-fits codebooks and re-encodes the whole corpus — fine for a one-off
    batch job, wrong for a serving index (and the dominant cost of the
    pre-r12 ``pq_knn_refined`` bench row).

    ``fit``: ``"deterministic"`` — codebooks are slices of the ``k``
    smallest-id vectors and the encode is the Catalyst slice-grouped
    argmin (``similarity.pq_encode_deterministic``), so a SQL oracle
    re-derives the exact stored codes from the source corpus alone;
    ``"kmeans"`` — MLlib subspace k-means + Arrow-batched numpy encode
    (recall-first, rows-only checkable). ``cells``: also coarse-quantize
    (deterministic smallest-id centroids) and PARTITION the code table by
    ``_cell`` so a probed search scans ``nprobe/cells`` of the codes —
    the IVFADC layout (Jégou et al. 2011 §V).

    The sidecar records geometry + codebooks + centroids + the id
    high-water mark for the O8-style :func:`refresh_pq_index` catch-up.
    ``extra_meta`` entries (e.g. a source fingerprint) are stored
    verbatim for the caller's own staleness checks.
    """
    from kaer_spark.operators import similarity as S

    if fit == "deterministic":
        books = S.pq_fit_deterministic(corpus, vec_col, id_col, m, k)
        encoded = S.pq_encode_deterministic(corpus, books, vec_col)
    elif fit == "kmeans":
        books = S.pq_fit(corpus, vec_col, m=m, k=k, seed=seed)
        encoded = S.pq_encode(corpus, books, vec_col)
    else:
        raise ValueError(f"unknown fit {fit!r}: use 'deterministic' or 'kmeans'")

    centroids: list[list[float]] | None = None
    cols = [id_col, "pq_code"]
    if cells is not None:
        if fit == "deterministic":
            centroids = S.ivf_fit_deterministic(
                corpus, vec_col=vec_col, id_col=id_col, cells=cells
            )
        else:
            model = S.ivf_fit(corpus, vec_col=vec_col, cells=cells, seed=seed)
            centroids = [[float(x) for x in c] for c in model.clusterCenters()]
        encoded = S.ivf_assign_deterministic(encoded, centroids, vec_col)
        cols.append("_cell")

    writer = encoded.select(*cols).write.mode("overwrite")
    if cells is not None:
        writer = writer.partitionBy("_cell")
    writer.parquet(os.path.join(path, DATA_DIR))

    max_id = corpus.agg(F.max(id_col)).collect()[0][0]
    meta = {
        "kind": "pq",
        "m": m,
        "k": k,
        "dim": len(books[0][0]) * m,
        "fit": fit,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "cells": cells,
        "max_id": int(max_id) if max_id is not None else -1,
        "codebooks": books,
        "centroids": centroids,
    }
    if extra_meta:
        meta.update(extra_meta)
    _write_meta_atomic(path, PQ_META_FILE, meta)
    return meta


def read_pq_meta(path: str) -> dict:
    with open(os.path.join(path, PQ_META_FILE)) as f:
        return json.load(f)


def refresh_pq_index(corpus: DataFrame, path: str) -> dict:
    """Catch-up (reference O8, ``updateIndexFromLastId`` — the PQ twin of
    :func:`refresh_ivf_index`): encode vectors with ``id > meta.max_id``
    under the STORED codebooks (and stored coarse centroids, if any) and
    append their codes. No refit — codes stay comparable across the whole
    table, and the encode matches the build's encoder exactly (Catalyst
    argmin for ``deterministic``, numpy for ``kmeans``), so a refreshed
    index is row-identical to a from-scratch build over the union.
    Incremental, and idempotent against BOTH failure directions: the meta
    watermark flips atomically (tmp + ``os.replace``), and a replayed
    refresh after a crash-between-append-and-meta anti-joins away the ids
    already on disk (``_refresh_replay_guard``) instead of re-appending
    them."""
    from kaer_spark.operators import similarity as S

    meta = read_pq_meta(path)
    tail = corpus.filter(F.col(meta["id_col"]) > meta["max_id"])
    new_max = tail.agg(F.max(meta["id_col"])).collect()[0][0]
    if new_max is None:
        return meta  # nothing to replay
    tail = _refresh_replay_guard(tail, path, meta)
    if meta["fit"] == "deterministic":
        encoded = S.pq_encode_deterministic(
            tail, meta["codebooks"], meta["vec_col"]
        )
    else:
        encoded = S.pq_encode(tail, meta["codebooks"], meta["vec_col"])
    cols = [meta["id_col"], "pq_code"]
    if meta["cells"] is not None:
        encoded = S.ivf_assign_deterministic(
            encoded, meta["centroids"], meta["vec_col"]
        )
        cols.append("_cell")
    writer = encoded.select(*cols).write.mode("append")
    if meta["cells"] is not None:
        writer = writer.partitionBy("_cell")
    writer.parquet(os.path.join(path, DATA_DIR))
    meta["max_id"] = int(new_max)
    _write_meta_atomic(path, PQ_META_FILE, meta)
    return meta


def pq_index_topk(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    query_vector: Sequence[float],
    topk: int,
    shortlist: int = 50,
    nprobe: int | None = None,
    pred=None,
    escalate: bool = True,
) -> DataFrame:
    """Two-stage search over the MATERIALIZED code table: ADC shortlist
    from stored codes, exact re-rank against ``corpus``'s raw vectors —
    ``similarity.pq_topk_refined`` (or ``ivf_pq_topk`` when the index has
    cells and ``nprobe`` is given) served from the at-rest index instead
    of a per-call fit+encode, value-identical to the fresh computation by
    construction (same codebooks: the deterministic fit is a function of
    the source corpus; same stored argmin codes; same driver ADC tables).

    Stage 1 scans ONLY ``(id, pq_code)`` — plus directory-level cell
    pruning when probed — and heap-selects ``shortlist`` rows
    (TakeOrderedAndProject). Stage 2 joins the ≤``shortlist`` survivors
    (broadcast — bounded by the knob, never corpus-sized) back to the raw
    vectors for the exact float64 re-rank; reported ``_score`` carries no
    quantization error. At 100 TB stage 1 touches m ints × the probed
    fraction; raw vectors are read for ``shortlist`` rows only.

    ``pred`` (a boolean Column over ``corpus``) is the reference's
    filtered-kNN contract (``db/db.go:111-143``) on the compressed path
    (r12 verdict #8): matching ids — a predicate-pushed, id-only corpus
    scan — SEMI-JOIN the code table BEFORE the ADC cut, so the shortlist
    ranks only matches ("k nearest among matches", never an under-filled
    top-k-minus-nonmatches). With cells + ``nprobe``, matches can still
    live outside the probed cells, so ``escalate`` (default True) doubles
    ``nprobe`` until ``topk`` rows fill or every cell is probed — the
    :func:`ivf_index_topk` recipe; each escalation check is one bounded
    count, and the common case pays exactly one."""
    from kaer_spark.operators.similarity import ivf_probe_cells, py_l2sq

    meta = read_pq_meta(path)
    m, d = meta["m"], meta["dim"] // meta["m"]
    q = [float(x) for x in query_vector]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    base_codes = spark.read.parquet(os.path.join(path, DATA_DIR))
    if nprobe is not None and meta["cells"] is None:
        raise ValueError("index has no coarse cells; build with cells=")
    match_ids = None
    if pred is not None:
        match_ids = corpus.filter(pred).select(id_col)
    tables = [
        [py_l2sq(q[j * d : (j + 1) * d], c) for c in meta["codebooks"][j]]
        for j in range(m)
    ]
    tables_lit = double_matrix_lit(tables)
    adc = F.aggregate(
        F.zip_with(F.col("pq_code"), tables_lit, lambda c, t: t[c]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n_cells = meta["cells"] or 0
    cur = None if nprobe is None else max(1, min(int(nprobe), n_cells))
    while True:
        codes = base_codes
        if cur is not None:
            probe = ivf_probe_cells(meta["centroids"], q, cur)
            codes = codes.filter(F.col("_cell").isin(probe))
        if match_ids is not None:
            codes = codes.join(match_ids, id_col, "left_semi")
        short = (
            codes.withColumn("_adc", adc)
            .orderBy(F.col("_adc").asc(), F.col(id_col).asc())
            .limit(int(shortlist))
            .select(id_col)
        )
        out = (
            corpus.join(F.broadcast(short), id_col)
            .withColumn("_score", l2sq(vec_col, q))
            .orderBy(F.col("_score").asc(), F.col(id_col).asc())
            .limit(int(topk))
            .select(id_col, "_score")
        )
        if (
            pred is None
            or not escalate
            or cur is None
            or cur >= n_cells
        ):
            return out
        # Escalation check counts the SHORTLIST, not the re-ranked result:
        # every shortlist id joins the corpus by construction (codes derive
        # from it), so |out| = min(topk, |short|) and the two counts answer
        # identically — but the shortlist plan stops before the re-rank
        # join, and the returned `out` is uncached, so counting `out` here
        # executed the full two-stage plan TWICE per call even in the
        # common no-escalation case (r13 advice).
        if short.count() >= int(topk):
            return out
        cur = min(cur * 2, n_cells)


def pq_index_knn_join(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    topk: int,
    shortlist: int = 50,
    nprobe: int | None = None,
    query_vec_col: str = "embedding",
    query_id_col: str = "query_id",
    pred=None,
    max_unprobed_queries: int = 100_000,
) -> DataFrame:
    """Batch kNN JOIN served from the AT-REST code table — the
    many-queries form of :func:`pq_index_topk`, completing the compressed
    serving stack (the IVF family has :func:`ivf_index_knn_join`; this is
    its PQ twin for query tables instead of one vector per call). Returns
    ``(query_id, id, _score, rank 1..topk)``.

    Per query, stage 1 computes the ADC lookup table IN-PLAN — a compact
    higher-order fold of the stored codebooks (literals from the sidecar)
    against the query vector, evaluated once per QUERY row, never per
    corpus row — then scores every stored code via the same
    ``zip_with``-gather as the single-query path and heap-cuts
    ``shortlist`` survivors per query (``row_number`` ≤ k triggers the
    WindowGroupLimit rewrite, so the per-query exchange is bounded).
    Stage 2 re-ranks the ≤ queries×shortlist survivors against raw
    vectors in exact float64. The code table is read ONCE for the whole
    batch (m ints per vector), queries broadcast (unprobed) or explode
    ``nprobe``× onto the ``_cell`` equi-join (probed, celled index) — the
    corpus-side scan never replicates per query.

    With ``fit="deterministic"`` codebooks the whole batch — per-query
    ADC tables included — replays relationally, so the driver oracle
    value-checks every stage (``pq_knn_join``).

    ``pred`` is the filtered contract, same recipe as
    :func:`pq_index_topk`: matching ids semi-join the code table BEFORE
    the per-query shortlist cut — "k nearest among matches" for every
    query in the batch. (No nprobe escalation here: a batch can't
    escalate per-query without forking plans — pass ``nprobe=None`` for
    filtered batches, or size ``nprobe`` for the filter's selectivity.)

    The unprobed branch (``nprobe=None``) BROADCASTS the query table and
    crosses it with the code scan — correct for eval-sized batches, a
    codes×queries blow-up for a training-sized one. ``max_unprobed_queries``
    (default 100k rows — ~few hundred MB broadcast at dim 64 float64, and
    100k × corpus-codes cross work) is the geometry guard (the r12 lesson:
    guards beat docstrings): a larger unprobed query side raises with the
    fix spelled out (pass ``nprobe`` on a celled index — the query side
    then explodes nprobe× onto a cell EQUI-join and never crosses the
    corpus — or raise the knob deliberately). The count costs one bounded
    scan of the query table, paid only on the unprobed branch."""
    from pyspark.sql.window import Window

    from kaer_spark.operators.similarity import ivf_probe_cells  # noqa: F401

    meta = read_pq_meta(path)
    m, d = meta["m"], meta["dim"] // meta["m"]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    books = meta["codebooks"]
    cb_lit = double_nested_lit(books)
    qv = F.col("__qvec").cast("array<double>")
    # per-(subspace, codeword) squared-L2 of the query slice — left-assoc
    # fold from 0.0, the engine-wide IEEE op order every oracle replays
    adc_table = F.transform(
        cb_lit,
        lambda book, s: F.transform(
            book,
            lambda code: F.aggregate(
                F.zip_with(
                    code,
                    F.slice(qv, s * F.lit(d) + F.lit(1), F.lit(d)),
                    lambda c, x: (x - c) * (x - c),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
        ),
    )
    qtab = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_vec_col).alias("__qvec"),
    ).withColumn("__adc_table", adc_table)
    codes = spark.read.parquet(os.path.join(path, DATA_DIR))
    if pred is not None:
        codes = codes.join(
            corpus.filter(pred).select(id_col), id_col, "left_semi"
        )
    if nprobe is not None:
        if meta["cells"] is None:
            raise ValueError("index has no coarse cells; build with cells=")
        cents = meta["centroids"]
        cdists = F.array(
            *[
                F.struct(
                    l2sq("__qvec", c).alias("dist"), F.lit(j).alias("j")
                )
                for j, c in enumerate(cents)
            ]
        )
        probe = F.transform(
            F.slice(F.array_sort(cdists), 1, int(nprobe)), lambda s: s["j"]
        )
        qtab = qtab.withColumn("_cell", F.explode(probe))
        scored = codes.join(F.broadcast(qtab), "_cell")
    else:
        n_queries = queries.count()
        if n_queries > int(max_unprobed_queries):
            raise ValueError(
                f"pq_index_knn_join: {n_queries} queries on the unprobed "
                f"branch exceeds max_unprobed_queries="
                f"{int(max_unprobed_queries)} — the query table would "
                "broadcast and CROSS the whole code scan. Pass nprobe= "
                "(celled index: the queries equi-join on _cell instead), "
                "or raise max_unprobed_queries deliberately."
            )
        scored = codes.crossJoin(F.broadcast(qtab))
    adc = F.aggregate(
        F.zip_with(F.col("pq_code"), F.col("__adc_table"), lambda c, t: t[c]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w1 = Window.partitionBy("__qid").orderBy(
        F.col("_adc").asc(), F.col(id_col).asc()
    )
    short = (
        scored.withColumn("_adc", adc)
        .select("__qid", id_col, "_adc")
        .withColumn("__r", F.row_number().over(w1))
        .filter(F.col("__r") <= int(shortlist))
        .select("__qid", id_col)
    )
    rerank = (
        corpus.join(F.broadcast(short), id_col)
        .join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col).alias("__qid"),
                    F.col(query_vec_col).alias("__qvec"),
                )
            ),
            "__qid",
        )
        .withColumn("_score", l2sq(vec_col, F.col("__qvec")))
    )
    w2 = Window.partitionBy("__qid").orderBy(
        F.col("_score").asc(), F.col(id_col).asc()
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= int(topk))
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.col("_score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivf_index_stats(
    spark: SparkSession,
    path: str,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Health report for an at-rest IVF index — the observability the
    frozen-geometry refresh contract needs at 100 TB: :func:`refresh_ivf_index`
    assigns new vectors to the STORED centroids (no refit — the reference's
    own O8 semantics, ``db/db.go:191-207``), which is correct and keeps
    results comparable, but under distribution drift the cells skew and
    probed recall decays silently. kaer has the same blind spot (its HNSW
    never rebalances); this closes it with a pure relational pass over the
    index table — one scan, one count aggregate, two rank lookups.

    One row per NON-EMPTY cell (an absent cell id is itself a signal —
    that centroid attracts nothing):

    * ``n_vectors``, ``size_frac`` — cell-size histogram;
    * ``skew`` — ``n / (total / cells)``; a perfectly balanced index reads
      1.0 everywhere, and ``oversized`` flags ``skew > 2.0``;
    * ``p50_resid`` / ``p90_resid`` / ``max_resid`` — residual (squared L2
      to the row's STORED cell centroid) at the rank-based type-1
      quantiles ``ceil(n/2)`` / ``ceil(0.9 n)`` — pure selection, no
      interpolation arithmetic, so the figures replay bit-exactly in a
      SQL oracle;
    * ``watermark`` (+ ``watermark_lag`` when ``corpus`` is given) —
      ingest staleness of the index vs the live corpus.

    REBUILD TRIGGER (documented policy, deliberately not automated —
    rebuild cost is an operator decision): re-fit the coarse quantizer
    when any cell reads ``oversized`` (probe cost on that cell is ≥2× the
    balanced design point, and it keeps absorbing its neighborhood's new
    vectors), or when ``p90_resid`` grows materially above the build-time
    baseline row for the same cell (the stored centroids no longer
    describe the data — probed recall is decaying). Compare against a
    SNAPSHOT of this report taken at build time; the report is cheap
    enough to run per refresh."""
    from pyspark.sql.window import Window

    meta = read_index_meta(path)
    data = spark.read.parquet(os.path.join(path, DATA_DIR))
    cents = double_matrix_lit(meta["centroids"])
    resid = l2sq(
        meta["vec_col"],
        F.element_at(cents, F.col("_cell").cast("int") + F.lit(1)),
    )
    ranked = (
        data.select(
            F.col("_cell").cast("int").alias("cell"),
            F.col(meta["id_col"]).alias("_id"),
            resid.alias("_resid"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("cell").orderBy(
                    F.col("_resid").asc(), F.col("_id").asc()
                )
            ),
        )
        .localCheckpoint(eager=False)  # three consumers below
    )
    counts = ranked.groupBy("cell").agg(
        F.count("*").alias("n_vectors"), F.max("_resid").alias("max_resid")
    )
    marks = counts.select(
        "cell",
        "n_vectors",
        "max_resid",
        F.expr("(n_vectors + 1) div 2").alias("_r50"),
        F.expr("(9 * n_vectors + 9) div 10").alias("_r90"),
    )
    p50 = ranked.join(
        marks.select("cell", F.col("_r50").alias("_rn")), ["cell", "_rn"]
    ).select("cell", F.col("_resid").alias("p50_resid"))
    p90 = ranked.join(
        marks.select("cell", F.col("_r90").alias("_rn")), ["cell", "_rn"]
    ).select("cell", F.col("_resid").alias("p90_resid"))
    tot = counts.agg(F.sum("n_vectors").alias("_tot"))
    out = (
        marks.join(p50, "cell")
        .join(p90, "cell")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "size_frac", F.col("n_vectors").cast("double") / F.col("_tot")
        )
        .withColumn(
            "skew",
            (F.col("n_vectors") * F.lit(int(meta["cells"]))).cast("double")
            / F.col("_tot"),
        )
        .withColumn("oversized", F.col("skew") > F.lit(2.0))
        .withColumn("watermark", F.lit(int(meta["max_id"])).cast("long"))
    )
    if corpus is not None:
        live_max = corpus.agg(F.max(meta["id_col"])).collect()[0][0]
        lag = int(live_max) - int(meta["max_id"]) if live_max is not None else 0
        out = out.withColumn("watermark_lag", F.lit(lag).cast("long"))
    drop = ["_r50", "_r90", "_tot"]
    return out.drop(*drop)


def pq_index_stats(
    spark: SparkSession,
    path: str,
    corpus: DataFrame,
    corpus_id_col: str | None = None,
    corpus_vec_col: str | None = None,
) -> DataFrame:
    """Health report for an at-rest PQ code table — the compressed twin of
    :func:`ivf_index_stats`: :func:`refresh_pq_index` encodes new vectors
    under the FROZEN codebooks, so under drift the reconstruction error of
    the stored codes creeps up and ADC rankings silently lose fidelity.
    This measures exactly that: each stored code is decoded against the
    SIDECAR codebooks and compared to the live vector (join on id — the
    code table stores no vectors, by design), giving per-group

    ``n_codes`` and ``p50_err`` / ``p90_err`` / ``max_err`` — the
    reconstruction squared-L2 at the same rank-based type-1 quantiles as
    the IVF report (bit-exact replayable) — plus ``watermark`` /
    ``watermark_lag``. Grouped per coarse cell when the index is IVFADC
    (``cells`` in the sidecar); one row with ``cell = -1`` otherwise.
    Because the error is computed from the STORED codes (not a fresh
    argmin encode), a corrupted or stale code table shows up here too —
    and in the SQL oracle gate, where the replayed encode would disagree.

    REBUILD TRIGGER (documented policy): re-fit codebooks when ``p90_err``
    grows materially above the build-time snapshot — quantization error is
    the direct bound on ADC ranking fidelity (Jégou et al. 2011 §III), so
    unlike cell skew there is no second-order symptom to wait for.

    Scale note: the exact rank-based quantiles sort WITHIN each group, so
    on an IVFADC table (``cells`` set) the sort is cell-bounded; a
    no-cells table ranks in ONE group — a global sort, fine for the
    no-cells layout's intended size but the wrong tool at 100 TB (where
    the code table should be cell-partitioned anyway, and is)."""
    from pyspark.sql.window import Window

    meta = read_pq_meta(path)
    icol = corpus_id_col or meta["id_col"]
    vcol = corpus_vec_col or meta["vec_col"]
    books = meta["codebooks"]
    m, d = len(books), len(books[0][0])
    codes = spark.read.parquet(os.path.join(path, DATA_DIR))
    joined = codes.join(
        corpus.select(
            F.col(icol).alias(meta["id_col"]),
            F.col(vcol).cast("array<double>").alias("__vec"),
        ),
        meta["id_col"],
    )
    err = None
    for s in range(m):
        book_s = double_matrix_lit(books[s])
        cent = F.element_at(
            book_s, F.element_at(F.col("pq_code"), s + 1) + F.lit(1)
        )
        e_s = l2sq(F.slice(F.col("__vec"), s * d + 1, d), cent)
        err = e_s if err is None else err + e_s
    cell = (
        F.col("_cell").cast("int")
        if meta.get("cells") is not None
        else F.lit(-1).cast("int")
    )
    ranked = (
        joined.select(
            cell.alias("cell"),
            F.col(meta["id_col"]).alias("_id"),
            err.alias("_err"),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("cell").orderBy(
                    F.col("_err").asc(), F.col("_id").asc()
                )
            ),
        )
        .localCheckpoint(eager=False)
    )
    counts = ranked.groupBy("cell").agg(
        F.count("*").alias("n_codes"), F.max("_err").alias("max_err")
    )
    marks = counts.select(
        "cell",
        "n_codes",
        "max_err",
        F.expr("(n_codes + 1) div 2").alias("_r50"),
        F.expr("(9 * n_codes + 9) div 10").alias("_r90"),
    )
    p50 = ranked.join(
        marks.select("cell", F.col("_r50").alias("_rn")), ["cell", "_rn"]
    ).select("cell", F.col("_err").alias("p50_err"))
    p90 = ranked.join(
        marks.select("cell", F.col("_r90").alias("_rn")), ["cell", "_rn"]
    ).select("cell", F.col("_err").alias("p90_err"))
    live_max = corpus.agg(F.max(F.col(icol))).collect()[0][0]
    lag = int(live_max) - int(meta["max_id"]) if live_max is not None else 0
    return (
        marks.join(p50, "cell")
        .join(p90, "cell")
        .withColumn("watermark", F.lit(int(meta["max_id"])).cast("long"))
        .withColumn("watermark_lag", F.lit(lag).cast("long"))
        .drop("_r50", "_r90")
    )
