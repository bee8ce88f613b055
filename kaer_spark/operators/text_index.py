"""Materialized inverted text index: posting lists + BM25 top-k search.

Completes the retrieval story next to the vector index (``index_store``):
the reference serves only embedding kNN, but a corpus engine also needs
term search — sampling exemplars by keyword, debugging dedup clusters,
powering the BM25 relevance cut without re-tokenizing the corpus per
query. The index is a plain parquet layout, so the same recovery story
as everything else (atomic sidecar, no daemon):

``<path>/postings/``   (term, id, tf, positions) partitioned by
                       ``bucket`` = pmod(polyhash(term), n_buckets) —
                       query terms map to buckets DRIVER-SIDE, so a
                       search reads only the matching partitions
                       (partition pruning, same trick as the IVF cell
                       directory). ``positions`` (sorted 0-based token
                       offsets) makes it a POSITIONAL index: exact
                       phrase search without re-tokenizing the corpus
                       (``search_phrase``).
``<path>/doclens/``    (id, dl) — per-doc token counts for BM25 length
                       normalization.
``<path>/index.json``  {n_docs, sum_dl, n_buckets, ...} corpus stats
                       frozen at build time.

Search scores with EXACTLY ``ranking.bm25_scores``' arithmetic (rational
idf, fixed left-assoc term order), so for any query the index path
returns the same doubles as the scan path restricted to docs holding at
least one term — which is what makes the driver oracle a plain SQL
replay over raw documents.

Scale: build is one explode + one (term, id) aggregate + one id
aggregate (all map-side combined). Search reads O(postings of the query
terms): per-term document frequencies come from the pruned postings
themselves, the per-term stats broadcast, and the final top-k plans as
TakeOrderedAndProject. df(t) at search time reflects the CURRENT
postings, N/avgdl come from the sidecar — refresh by rebuilding (the
index is derived data; rebuild is one pass).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaer_spark.functions.text import tokens
from kaer_spark.operators.util import (
    ensure_parallelism,
    global_ranked,
    watermark_health_cols,
)

META_FILE = "index.json"
POSTINGS_DIR = "postings"
DOCLENS_DIR = "doclens"
HASH_MOD = 1_000_000_007
HASH_BASE = 31
K1_DEFAULT = 1.2
B_DEFAULT = 0.75
# pruned-postings size above which the candidate side is no longer
# broadcast into doclens (well under Spark's 8 GB broadcast hard cap,
# with headroom for the pivoted row being wider than its parquet bytes)
BROADCAST_POSTINGS_BYTES = 64 << 20


def _pruned_postings_bytes(path: str, buckets: list[int]) -> int:
    """On-disk bytes of exactly the posting buckets a search will scan —
    the driver-side stat that gates the candidate-side broadcast (same
    listing the partition-pruned scan itself performs; no Spark job)."""
    total = 0
    base = os.path.join(path, POSTINGS_DIR)
    for b in buckets:
        d = os.path.join(base, f"bucket={b}")
        if not os.path.isdir(d):
            continue
        for root, _dirs, files in os.walk(d):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return total


def py_term_hash(term: str) -> int:
    """Driver-side twin of the engine's polynomial char hash (int64-exact,
    ASCII-codepoint fold) — used to map query terms to their posting
    buckets without touching the cluster."""
    acc = 0
    for ch in term:
        acc = (acc * HASH_BASE + ord(ch)) % HASH_MOD
    return acc


def _term_hash_col(col):
    codes = F.transform(
        F.split(col, ""), lambda ch: F.ascii(ch).cast("long")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * HASH_BASE + x) % HASH_MOD,
    )


def build_text_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> dict:
    """Materialize the inverted index for ``df`` at ``path`` (overwrite).

    Tokenization is the engine-wide whitespace split, lowercased — the
    same definition as ``bm25_scores``/``token_count``, so index-path and
    scan-path scores agree bit-for-bit.
    """
    # clear any prior build explicitly: partitioned overwrite under
    # spark.sql.sources.partitionOverwriteMode=dynamic only rewrites
    # buckets the NEW build touches, silently keeping stale partitions
    # from a previous larger build (the _commit_rewrite path clears for
    # exactly this reason — the build must too)
    shutil.rmtree(os.path.join(path, POSTINGS_DIR), ignore_errors=True)
    shutil.rmtree(os.path.join(path, DOCLENS_DIR), ignore_errors=True)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens(text_col), F.lower).alias("__toks"),
    )
    # positional postings: per (term, doc) keep the sorted 0-based token
    # positions next to tf — what turns the BM25 index into a phrase/
    # proximity index (Lucene's positional-postings trade: bigger lists,
    # exact phrase match with no corpus re-scan). collect_list is bounded
    # by one document's occurrences of one term.
    exploded = ensure_parallelism(toks).select(
        "id", F.posexplode("__toks").alias("pos", "term")
    )
    postings = (
        exploded.groupBy("term", "id")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.sort_array(
                F.collect_list(F.col("pos").cast("int"))
            ).alias("positions"),
        )
        .withColumn(
            "bucket", F.pmod(_term_hash_col(F.col("term")), F.lit(n_buckets))
        )
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, POSTINGS_DIR)
    )
    doclens = toks.select(
        "id", F.size("__toks").cast("long").alias("dl")
    )
    doclens.write.mode("overwrite").parquet(os.path.join(path, DOCLENS_DIR))
    stats = doclens.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sumdl"),
        F.max("id").alias("maxid"),
    ).collect()[0]
    meta = {
        "n_docs": int(stats["n"]),
        "sum_dl": int(stats["sumdl"] or 0),
        # any orderable, JSON-serializable id type works (ints stay ints;
        # string ids round-trip as-is for the refresh high-water filter)
        "max_id": _json_id(stats["maxid"]),
        "n_buckets": int(n_buckets),
        "id_col": id_col,
        "text_col": text_col,
        "positional": True,
    }
    _write_meta(path, meta)
    return meta


def _json_id(v):
    """High-water id as stored in the sidecar: int and string id columns
    ONLY (both JSON-round-trip losslessly AND order-consistently, which
    the ``id > watermark`` refresh filter depends on) — anything else
    fails loud HERE, at build/refresh time, instead of as json.dump's
    TypeError at the sidecar write after the data tables landed (the
    same rule as dedup's refreshable indexes)."""
    if v is None:
        return None
    if isinstance(v, bool) or not isinstance(v, (int, str)):
        raise TypeError(
            "refreshable index id columns must be int or string "
            f"(watermark comparisons ride the JSON round-trip); got "
            f"{type(v).__name__}: {v!r}"
        )
    return int(v) if isinstance(v, int) else v


def _write_meta(path: str, meta: dict) -> None:
    tmp = os.path.join(path, META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, META_FILE))


def refresh_text_index(df: DataFrame, path: str) -> dict:
    """Catch-up (the text twin of ``index_store.refresh_ivf_index``,
    reference O8's ``updateIndexFromLastId``): index only documents with
    ``id > meta.max_id`` — postings and doc lengths APPEND (each new doc
    contributes disjoint (term, id) rows, so existing postings never
    rewrite), and the frozen corpus stats advance incrementally
    (``n_docs += batch``, ``sum_dl += batch``). Idempotent against EVERY
    crash window, not just a clean re-call: a second call with no new
    docs is a no-op per the watermark; a replay after a crash between the
    two appends and the meta update anti-joins away the doc ids already
    in the doc-length table (no duplicate postings, stats healed); and a
    replay after a crash BETWEEN the postings append and the doc-length
    append (the write order here: postings land first) anti-joins the
    postings append itself against the (term-agnostic) ids already in the
    postings table above the watermark — without that second guard the
    orphaned docs' (term, id) rows would append twice, doubling tf AND df
    in ``search_text_index`` (which assumes distinct postings rows) —
    while still appending their missing doc-length rows and counting
    their stats (the re-derived rows are deterministic: same tokenizer,
    same text). Per-term document frequencies need no maintenance at all
    — search derives them from the pruned postings at query time, so
    they are always current."""
    meta = read_text_index_meta(path)
    id_col, text_col = meta["id_col"], meta["text_col"]
    # max_id None = nothing indexed yet: index the whole DataFrame rather
    # than comparing against a numeric sentinel (which fails or silently
    # casts for non-numeric id columns build_text_index accepts)
    tail = (
        df
        if meta["max_id"] is None
        else df.filter(F.col(id_col) > meta["max_id"])
    )
    # Replay guard: doc-length rows with id above the watermark are docs a
    # crashed refresh already appended but never accounted — exclude them
    # from the tail (no duplicate postings) and fold their (n, dl) back
    # into the stats increment (heals the understated n_docs/sum_dl).
    acc_n, acc_sumdl, acc_maxid = 0, 0, None
    doclens_dir = os.path.join(path, DOCLENS_DIR)
    if os.path.isdir(doclens_dir):
        already = df.sparkSession.read.parquet(doclens_dir)
        if meta["max_id"] is not None:
            already = already.filter(F.col("id") > meta["max_id"])
        acc = already.agg(
            F.count("*").alias("n"),
            F.sum("dl").alias("sumdl"),
            F.max("id").alias("maxid"),
        ).collect()[0]
        if acc["n"]:
            acc_n, acc_sumdl = int(acc["n"]), int(acc["sumdl"] or 0)
            acc_maxid = acc["maxid"]
            tail = tail.join(
                already.select(F.col("id").alias(id_col)),
                [id_col],
                "left_anti",
            )
    toks = tail.select(
        F.col(id_col).alias("id"),
        F.transform(tokens(text_col), F.lower).alias("__toks"),
    )
    stats = toks.select(
        F.size("__toks").cast("long").alias("dl"), "id"
    ).agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sumdl"),
        F.max("id").alias("maxid"),
    ).collect()[0]
    if not stats["n"] and not acc_n:
        return meta  # nothing to replay
    if not stats["n"]:  # pure replay: everything already on disk — heal meta
        meta["n_docs"] += acc_n
        meta["sum_dl"] += acc_sumdl
        meta["max_id"] = _json_id(acc_maxid)
        _write_meta(path, meta)
        return meta
    aggs = [F.count("*").cast("long").alias("tf")]
    if meta.get("positional"):
        aggs.append(
            F.sort_array(
                F.collect_list(F.col("pos").cast("int"))
            ).alias("positions")
        )
    # Second replay guard, for the OTHER crash window: postings append
    # BEFORE doclens below, so a crash between the two leaves (term, id)
    # rows above the watermark with no doclens row — invisible to the
    # doclens guard above. Exclude those docs from the postings append
    # ONLY (their rows already landed); their doclens rows and stats
    # still flow through `toks`. In the no-crash case the filtered read
    # returns zero rows (row-group stats prune at id > watermark) and the
    # anti-join is a no-op.
    toks_postings = toks
    postings_dir = os.path.join(path, POSTINGS_DIR)
    if os.path.isdir(postings_dir):
        try:
            ghost = df.sparkSession.read.parquet(postings_dir).select("id")
        except AnalysisException:
            # a build over zero rows writes a partitioned dir with no part
            # files (partitions are data-driven) — nothing to guard against
            ghost = None
        if ghost is not None:
            if meta["max_id"] is not None:
                ghost = ghost.filter(F.col("id") > meta["max_id"])
            toks_postings = toks.join(ghost.distinct(), "id", "left_anti")
    # an index built before the positional layout keeps appending the
    # (term, id, tf) shape it was built with — mixed parquet schemas in
    # one postings dir would make reads schema-dependent on file order
    postings = (
        toks_postings.select("id", F.posexplode("__toks").alias("pos", "term"))
        .groupBy("term", "id")
        .agg(*aggs)
        .withColumn(
            "bucket",
            F.pmod(_term_hash_col(F.col("term")), F.lit(meta["n_buckets"])),
        )
    )
    postings.write.mode("append").partitionBy("bucket").parquet(
        os.path.join(path, POSTINGS_DIR)
    )
    toks.select("id", F.size("__toks").cast("long").alias("dl")).write.mode(
        "append"
    ).parquet(os.path.join(path, DOCLENS_DIR))
    meta["n_docs"] += int(stats["n"]) + acc_n
    meta["sum_dl"] += int(stats["sumdl"] or 0) + acc_sumdl
    new_max = stats["maxid"]
    if acc_maxid is not None and (new_max is None or acc_maxid > new_max):
        new_max = acc_maxid
    meta["max_id"] = _json_id(new_max)
    _write_meta(path, meta)
    return meta


def text_index_stats(
    spark,
    path: str,
    corpus: "DataFrame | None" = None,
    corpus_id_col: str | None = None,
) -> "DataFrame":
    """Health report for the at-rest positional text index — the BM25
    member of the r15 index-observability set (``ivf_index_stats`` /
    ``pq_index_stats`` / ``shingle_index_stats``): one summary row from
    the index tables alone.

    * ``n_docs`` / ``n_postings`` / ``n_terms`` — corpus, posting-list
      mass (the per-query scan cost driver), vocabulary size;
    * ``p50_df`` / ``p90_df`` / ``max_df`` — document-frequency skew at
      rank-based type-1 quantiles (bit-exact replayable): a fat head
      means query terms hit ever-longer posting lists;
    * ``p50_dl`` / ``p90_dl`` / ``max_dl`` — doclen distribution (BM25's
      length normalization input);
    * ``bucket_skew`` — max term-hash bucket's posting share vs the
      balanced design point (``max_bucket × n_buckets / total``): the
      postings are partitioned by term-hash bucket, so a skewed bucket
      is a skewed partition on every indexed search;
    * ``watermark`` (+ ``watermark_lag`` with ``corpus``) — staleness.

    REFRESH/REBUILD TRIGGER (documented policy): refresh per ingest
    (``refresh_text_index`` is tail-bound); re-bucket (rebuild with a
    larger ``n_buckets``) when ``bucket_skew`` grows past ~2 — the hash
    is content-agnostic, so persistent skew means the bucket count is
    too small for the vocabulary, not that the hash went bad.

    Scale note: the df quantiles rank ONE ROW PER TERM
    (vocabulary-sized, not posting-sized), the dl quantiles one row per
    document — both via two-level rank selection (``util.global_ranked``:
    range-partitioned per-partition ranks + partition offsets, bit-exact,
    no single-reducer sort)."""
    meta = read_text_index_meta(path)
    postings = spark.read.parquet(os.path.join(path, POSTINGS_DIR))
    doclens = spark.read.parquet(os.path.join(path, DOCLENS_DIR))
    # localCheckpoint (lazy): tdf feeds two consumers (stats, the rank
    # branch) and would otherwise re-aggregate the postings per branch
    tdf = postings.groupBy("term").agg(F.count("*").alias("df")).localCheckpoint(
        eager=False
    )
    dfstats = tdf.agg(
        F.count("*").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        F.max("df").cast("long").alias("max_df"),
    )
    # both quantile picks per ranked frame ride one conditional-aggregate
    # branch (r17 — see dedup.minhash_index_stats; the single consumers
    # need no checkpoint)
    t50_df = F.expr("(n_terms + 1) div 2")
    t90_df = F.expr("(9 * n_terms + 9) div 10")
    sel_df = (
        global_ranked(tdf, [F.col("df").asc(), F.col("term").asc()])
        .crossJoin(F.broadcast(dfstats))
        .filter((F.col("_rn") == t50_df) | (F.col("_rn") == t90_df))
        .groupBy(F.lit(True).alias("_g"))
        .agg(
            F.max(F.when(F.col("_rn") == t50_df, F.col("df")))
            .cast("long")
            .alias("p50_df"),
            F.max(F.when(F.col("_rn") == t90_df, F.col("df")))
            .cast("long")
            .alias("p90_df"),
        )
        .drop("_g")
    )
    dlstats = doclens.agg(
        F.count("*").alias("n_docs"), F.max("dl").cast("long").alias("max_dl")
    )
    t50_dl = F.expr("(n_docs + 1) div 2")
    t90_dl = F.expr("(9 * n_docs + 9) div 10")
    sel_dl = (
        global_ranked(doclens, [F.col("dl").asc(), F.col("id").asc()])
        .crossJoin(F.broadcast(dlstats))
        .filter((F.col("_rn") == t50_dl) | (F.col("_rn") == t90_dl))
        .groupBy(F.lit(True).alias("_g"))
        .agg(
            F.max(F.when(F.col("_rn") == t50_dl, F.col("dl")))
            .cast("long")
            .alias("p50_dl"),
            F.max(F.when(F.col("_rn") == t90_dl, F.col("dl")))
            .cast("long")
            .alias("p90_dl"),
        )
        .drop("_g")
    )
    bmax = (
        postings.groupBy("bucket")
        .agg(F.count("*").alias("bc"))
        .agg(F.max("bc").alias("max_bucket"))
    )
    out = (
        dlstats.crossJoin(F.broadcast(dfstats))
        .crossJoin(F.broadcast(sel_df))
        .crossJoin(F.broadcast(sel_dl))
        .crossJoin(F.broadcast(bmax))
        .withColumn(
            "bucket_skew",
            (F.col("max_bucket") * F.lit(int(meta["n_buckets"]))).cast(
                "double"
            )
            / F.col("n_postings"),
        )
        .drop("max_bucket")
    )
    return watermark_health_cols(
        out, meta["max_id"], corpus, corpus_id_col or meta["id_col"]
    )


def read_text_index_meta(path: str) -> dict:
    with open(os.path.join(path, META_FILE)) as f:
        return json.load(f)


def search_text_index(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 10,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """BM25 top-``k`` over the materialized index → ``(id, bm25)``,
    descending score, ties to min id. Only documents containing at least
    one query term are candidates (docs with none score 0 by definition
    and are never read).

    Plan: the query terms' buckets are computed driver-side and pushed as
    a partition filter (the scan touches only those directories); the
    pruned postings pivot into one per-candidate-doc row of per-term tfs
    (one hash aggregate) and the per-term document frequencies collapse
    to a single broadcast row — so the join against the corpus-sized
    doclens table BROADCASTS the candidate side whenever the pruned
    postings' on-disk bytes are provably small (doclens never shuffles;
    at 100 TB doclens is corpus-sized while the candidates are bounded
    by the query terms' postings, the quantity this index exists to keep
    small), and degrades to a plain AQE-planned join for stop-word-ish
    queries whose postings approach corpus size rather than forcing an
    over-limit broadcast. The fixed-order score sum (declared term order,
    left-assoc,
    missing terms an exact +0.0) feeds a TakeOrderedAndProject —
    bit-identical to ``ranking.bm25_scores`` on the same corpus.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = [t.lower() for t in terms]
    meta = read_text_index_meta(path)
    doclens = spark.read.parquet(os.path.join(path, DOCLENS_DIR))
    if meta["n_docs"] == 0:
        # empty index is a supported state (build before first insert):
        # no candidates by definition — id column keeps the corpus type
        return doclens.select(
            "id", F.lit(0.0).alias("bm25")
        ).limit(0)
    buckets = sorted({py_term_hash(t) % meta["n_buckets"] for t in terms})
    postings = (
        spark.read.parquet(os.path.join(path, POSTINGS_DIR))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(terms))
    )
    n = float(meta["n_docs"])
    avgdl = float(meta["sum_dl"]) / n
    # postings rows are distinct (term, id): df(t) = row count per term,
    # folded into ONE broadcast row of per-term frequencies
    pstats = postings.agg(
        *[
            F.sum((F.col("term") == t).cast("long")).alias(f"__df{i}")
            for i, t in enumerate(terms)
        ]
    )
    # pivot the candidate postings to one row per doc (per-term tfs);
    # NULL tf = doc lacks the term (contributes exact +0.0 below)
    per_doc = postings.groupBy("id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf"))).alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ]
    )
    # join the bounded candidate side into the corpus-sized doclens:
    # broadcast when the pruned postings are provably small (a driver-side
    # stat of exactly the bucket files the scan will read — no job), so
    # doclens never shuffles on the common path; a stop-word-ish query
    # whose postings approach corpus size must NOT be forced through the
    # 8 GB broadcast limit — it falls back to a plain join and lets AQE
    # pick the strategy from runtime sizes
    per_doc_side = (
        F.broadcast(per_doc)
        if _pruned_postings_bytes(path, buckets) <= BROADCAST_POSTINGS_BYTES
        else per_doc
    )
    cand = per_doc_side.join(doclens, "id").crossJoin(F.broadcast(pstats))
    norm = F.col("dl").cast("double") / F.lit(avgdl)
    total = None
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        df_t = F.col(f"__df{i}").cast("double")
        idf = (F.lit(n) - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        num = tf * F.lit(float(k1) + 1.0)
        denom = tf + F.lit(float(k1)) * (
            F.lit(1.0 - float(b)) + F.lit(float(b)) * norm
        )
        term_score = F.coalesce((idf * num) / denom, F.lit(0.0))
        total = term_score if total is None else total + term_score
    return (
        cand.select(F.col("id"), total.alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("id").asc())
        .limit(k)
    )


def search_phrase(
    spark: SparkSession,
    path: str,
    phrase: str | list[str],
    k: int | None = None,
) -> DataFrame:
    """Exact-phrase search over the positional index → ``(id,
    n_occurrences)`` for every document containing the query tokens at
    CONSECUTIVE positions (occurrences may overlap, each start counts),
    optionally top-``k`` by (count desc, id asc).

    This is what the per-(term, doc) position lists exist for: phrase
    match without re-tokenizing the corpus. Plan shape mirrors
    ``search_text_index`` — query buckets prune the postings scan
    driver-side, the pruned postings pivot to ONE row per candidate doc
    (the position array of each distinct query term), docs missing any
    term drop at the pivot, and the consecutive-position test is a pure
    array expression (filter + array_contains over the first term's
    positions): no join against the corpus, no shuffle beyond the pivot's
    candidate-bounded aggregate. A single-token phrase degenerates to the
    term's tf."""
    terms = phrase.split() if isinstance(phrase, str) else list(phrase)
    terms = [t.lower() for t in terms if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    meta = read_text_index_meta(path)
    if not meta.get("positional"):
        raise ValueError(
            "index at %r predates the positional layout — rebuild with "
            "build_text_index to enable phrase search" % path
        )
    uterms = list(dict.fromkeys(terms))
    slot = {t: i for i, t in enumerate(uterms)}
    if meta["n_docs"] == 0:
        doclens = spark.read.parquet(os.path.join(path, DOCLENS_DIR))
        return doclens.select(
            "id", F.lit(0).cast("long").alias("n_occurrences")
        ).limit(0)
    buckets = sorted({py_term_hash(t) % meta["n_buckets"] for t in uterms})
    postings = (
        spark.read.parquet(os.path.join(path, POSTINGS_DIR))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(uterms))
    )
    # one row per candidate doc: the position array of each distinct
    # query term ((term, id) rows are unique, so first() is THE array)
    per_doc = postings.groupBy("id").agg(
        *[
            F.first(
                F.when(F.col("term") == t, F.col("positions")),
                ignorenulls=True,
            ).alias(f"__p{i}")
            for i, t in enumerate(uterms)
        ]
    )
    has_all = None
    for i in range(len(uterms)):
        c = F.col(f"__p{i}").isNotNull()
        has_all = c if has_all is None else has_all & c
    starts = F.filter(
        F.col(f"__p{slot[terms[0]]}"),
        lambda p: _consecutive(p, terms, slot),
    )
    out = (
        per_doc.filter(has_all)
        .select("id", F.size(starts).cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )
    if k is not None:
        out = out.orderBy(
            F.col("n_occurrences").desc(), F.col("id").asc()
        ).limit(int(k))
    return out


def _consecutive(p, terms: list[str], slot: dict) -> "F.Column":
    """True iff a phrase occurrence starts at position ``p``: every later
    term's position list contains ``p + j``."""
    cond = F.lit(True)
    for j in range(1, len(terms)):
        cond = cond & F.array_contains(
            F.col(f"__p{slot[terms[j]]}"), p + F.lit(j)
        )
    return cond


def search_near(
    spark: SparkSession,
    path: str,
    terms: list[str] | str,
    slop: int = 2,
    k: int | None = None,
) -> DataFrame:
    """Ordered proximity search over the positional index → ``(id,
    n_matches)``: documents containing the query terms IN ORDER with at
    most ``slop`` extra tokens interleaved (total span ≤ len(terms) +
    slop). ``slop=0`` ≡ exact phrase.

    Match counting is per start position of the FIRST term, with the
    GREEDY chain: each later term takes its smallest position after the
    previous term's. Greedy-min is exact for existence (if any in-order
    chain fits the span, the greedy one does — each greedy pick is ≤ the
    alternative's, so the span never grows), and it makes the count a
    deterministic pure-array expression both engines replay. Plan shape
    identical to :func:`search_phrase`: driver-pruned buckets,
    candidate-bounded pivot, no corpus re-scan."""
    terms = terms.split() if isinstance(terms, str) else list(terms)
    terms = [t.lower() for t in terms if t]
    if len(terms) < 1:
        raise ValueError("terms must contain at least one token")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    meta = read_text_index_meta(path)
    if not meta.get("positional"):
        raise ValueError(
            "index at %r predates the positional layout — rebuild with "
            "build_text_index to enable proximity search" % path
        )
    uterms = list(dict.fromkeys(terms))
    slot = {t: i for i, t in enumerate(uterms)}
    if meta["n_docs"] == 0:
        doclens = spark.read.parquet(os.path.join(path, DOCLENS_DIR))
        return doclens.select(
            "id", F.lit(0).cast("long").alias("n_matches")
        ).limit(0)
    buckets = sorted({py_term_hash(t) % meta["n_buckets"] for t in uterms})
    postings = (
        spark.read.parquet(os.path.join(path, POSTINGS_DIR))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(uterms))
    )
    per_doc = postings.groupBy("id").agg(
        *[
            F.first(
                F.when(F.col("term") == t, F.col("positions")),
                ignorenulls=True,
            ).alias(f"__p{i}")
            for i, t in enumerate(uterms)
        ]
    )
    has_all = None
    for i in range(len(uterms)):
        c = F.col(f"__p{i}").isNotNull()
        has_all = c if has_all is None else has_all & c

    span = len(terms) + int(slop)  # max allowed end - start + 1

    def _next_after(arr, lo):
        # NB: a two-arg lambda here would be read by Spark as the
        # (element, index) filter form — keep it unary, close over lo
        return F.array_min(F.filter(arr, lambda x: x > lo))

    def match_at(p):
        prev = p
        for j in range(1, len(terms)):
            prev = _next_after(F.col(f"__p{slot[terms[j]]}"), prev)
        # NULL prev (chain broke) compares NULL -> filtered out
        return prev.isNotNull() & (prev - p <= F.lit(span - 1))

    starts = F.filter(F.col(f"__p{slot[terms[0]]}"), match_at)
    out = (
        per_doc.filter(has_all)
        .select("id", F.size(starts).cast("long").alias("n_matches"))
        .filter(F.col("n_matches") > 0)
    )
    if k is not None:
        out = out.orderBy(
            F.col("n_matches").desc(), F.col("id").asc()
        ).limit(int(k))
    return out
