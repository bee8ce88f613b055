"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the scale-sensitive queries (big-table joins/aggs/windows +
the vector/dedup/text operators); tiny point-lookups are excluded since they
measure session overhead, not engine throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q18",
    "tpch_q22",
    "tpch_q19",
    "tpch_q8",
    "tpch_q17",
    "tpch_q2",
    "tpch_q9",
    "tpch_q11",
    "tpch_q20",
    "tpch_q21",
    "revenue_by_nation",
    "top_customers",
    "window_running",
    "events_json",
    "events_hourly",
    "time_bucket_rollup",
    "events_sessionize",
    "range_join_clicks",
    "knn_topk",
    "knn_filtered_and",
    "knn_join",
    "ivf_knn_det",
    "lsh_knn_det",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "simhash",
    "doc_fingerprint",
    "text_stats",
    "training_corpus_stats",
    "schemaless_exists",
    "bm25_scores",
    "pack_sequences",
    "shard_manifest",
    "cohort_retention",
    "sliding_7d",
    "top_quality_docs",
    "training_mix_packed",
    # round-7 additions: the r6 operator surface's scale-relevant members
    "ivf_knn_join",
    "bigram_lm_scores",
    "token_budget_mix",
    "subword_budget",
    "bpe_merges",
    "embedding_gram",
    "remove_repeated_lines",
    "dedup_minhash_between",
    "embedding_dups_between",
    "asof_nearest",
    "training_mix_tokens",
    "dsir_scores",
    "perplexity_buckets",
    "duplicate_passages",
    # round-9 additions: the passage-removal transform (heaviest new op),
    # the quality-aware corpus filter, and cell-blocked semantic dedup
    "remove_duplicate_passages",
    "dedup_keep_best",
    "semdedup",
    # round-13: the COLD cluster-artifact build (signatures → banding →
    # verify → closure) — the end-to-end cost dedup_keep_best no longer
    # pays now that it serves from the memoized cluster table
    "dedup_cluster_build",
    # round-13: indexed hard-negative mining (IVF cell equi-join)
    "ivf_hard_negatives",
    # round-13: batch compressed ANN join from the at-rest code table
    "pq_knn_join",
    # round-14 (r13 verdict #1: the newest, heaviest surface was bench-
    # invisible): the PRODUCTION-shape triplet assembly (partial probe,
    # nprobe=3 of 8 — the full-probe oracle twin stays registry-only),
    # filtered compressed serving, and the near-dup-aware holdout split
    "contrastive_triplets_mine",
    "pq_knn_filtered",
    "cluster_split",
    # round-14 (r13 verdict #8): the fleet's most expensive non-TPC-H row
    # served from the at-rest shingle index — pair stage only
    "dedup_ngram_jaccard_indexed",
    # round-14: recurring decontamination served from at-rest reference
    # indexes (MinHash bands+shingles / sign-LSH bands+vectors) — the
    # from-scratch twins stay benched as dedup_minhash_between /
    # embedding_dups_between. DETAIL-ONLY in stdout (capture-window
    # budget); full numbers in bench_detail.json like every row.
    "dedup_against_indexed",
    "embedding_dups_against_indexed",
    # round-15 (r14 verdict #2: the r14 flagship streaming subsystem was
    # bench-invisible): one full neardup ingest micro-batch — clone the
    # at-rest reference index, screen the re-keyed even-id batch, in-batch
    # self-dedup, corpus write, batch-sized index append — and its
    # embedding twin. The clone copy is harness overhead (~fixture-sized
    # file copy, measured <5% of the row at sf0.1).
    "streaming_neardup_ingest",
    "streaming_embedding_ingest",
    # round-11 additions: complete edit-distance join (new banded-join
    # family), two-stage PQ refine, MMR re-rank, and the two corpus-drift
    # diagnostics
    "fuzzy_near_dups",
    "winnow_overlap",
    "pq_knn_refined",
    "pq_index_catchup",
    "pps_sample_chars",
    "quantiles_sampled",
    "hard_negatives",
    "mmr_rerank",
    "token_divergence",
    "zipf_profile",
    # constant-size-broadcast decontamination (scan-shaped corpus probe)
    "bloom_decontam",
    # content-defined chunking: insertion-robust dedup-by-parts
    "cdc_stats",
    # replayable HLL: distinct counting with no distinct shuffle
    "hll_orderkeys",
    # round-11 closers: corpus-unique-gram novelty scoring and the
    # Count-Min token-frequency sketch
    "ngram_novelty",
    "cms_token_counts",
    "pmi_bigrams",
    # round-16: the PassJoin family's at-rest serving row (from-text twin
    # stays benched as fuzzy_near_dups / fuzzy_dups_between) and the
    # three new health reports — observability queries a recurring
    # pipeline runs per ingest, so their cost belongs on the trend line
    "fuzzy_index_catchup",
    "minhash_index_stats",
    "signlsh_index_stats",
    "fuzzy_index_stats",
    # round-17: the deterministic cross-corpus Jaccard screen (from-text
    # + at-rest serving) and the winnow family's serving + stats rows —
    # all DETAIL_ONLY (the stdout line is at its tail-capture budget)
    "jaccard_between",
    "jaccard_against_indexed",
    "winnow_index_catchup",
    "winnow_index_stats",
]

# Rows that serve from a standing artifact (fixture-fingerprint-memoized
# cluster table / at-rest PQ code table) rather than paying the build on
# every call (r12 verdict #1: the cross-round trend line for these rows
# broke silently when they switched to serve-only in r12 — recorded here
# and in bench_detail.json so the series stays interpretable). The build
# costs have their own end-to-end rows: dedup_cluster_build for the
# cluster chain, pq_index_catchup's FIRST reading per process for the PQ
# build+refresh (later reps serve the cached index).
SERVE_FROM_ARTIFACT = [
    "dedup_keep_best",
    "pq_knn_refined",
    "pq_knn_join",
    "pq_index_catchup",  # after the first rep in a process
    "cluster_split",     # reads the memoized cluster table (build cost =
                         # the dedup_cluster_build row)
    "pq_knn_filtered",   # at-rest PQ code table (fixture-memoized)
    "dedup_ngram_jaccard_indexed",  # at-rest shingle index; the from-text
                                    # cost stays the dedup_ngram_jaccard row
    "dedup_against_indexed",        # at-rest MinHash reference index
    "embedding_dups_against_indexed",  # at-rest sign-LSH reference index
    "fuzzy_index_catchup",   # at-rest PassJoin segment index (r16); the
                             # from-text cost stays the fuzzy_near_dups row
    "minhash_index_stats",   # read the at-rest band/shingle tables (r16)
    "signlsh_index_stats",
    "fuzzy_index_stats",
    # r17: at-rest shingle cross-corpus serve + winnow family (first
    # call per process pays the fixture build, like pq_index_catchup)
    "jaccard_against_indexed",
    "winnow_index_catchup",
    "winnow_index_stats",
]

# Rows measured and recorded in bench_detail.json but EXCLUDED from the
# stdout line's per-query dict: the driver parses only ~2000 tail chars
# (the r7 `parsed: null` failure), and the headline set has outgrown the
# window even at 2-decimal rounding. Keep this list to serve-from-artifact
# rows whose from-scratch/build twins ARE on the stdout line — their
# sub-second serve constants carry the least stdout signal per char.
# [r15] three more such rows rotate here (their twins dedup_ngram_jaccard,
# dedup_cluster_build, and the pq build inside pq_index_catchup stay on
# the line) to make room for the two NEW ingest rows, which have no twin
# anywhere on the line and are exactly what the round exists to make
# bench-visible. All DETAIL_ONLY rows still count in value/value_min, the
# cross-round shared-min ratios, and the committed bench_detail.json, so
# regressions stay visible round-over-round.
DETAIL_ONLY = [
    "dedup_against_indexed",
    "embedding_dups_against_indexed",
    "dedup_ngram_jaccard_indexed",
    "pq_knn_filtered",
    "cluster_split",
    # r16: the three health reports and the PassJoin serving row ride the
    # detail file only (stdout budget — the at-rest serving family was
    # already detail-only: dedup_against_indexed/embedding_dups_...), and
    # three more serve-from-artifact rows with build/from-text twins ON
    # the line rotate down to make room for the r16 line fields
    "minhash_index_stats",
    "signlsh_index_stats",
    "fuzzy_index_stats",
    "fuzzy_index_catchup",
    "pq_knn_refined",      # serve constant; pq build cost = pq_index_catchup detail
    # [r18] pq_knn_join RESTORED to the stdout line (r17 verdict #2: its
    # r17 rotation to detail-only broke the driver's per-query series —
    # the third such rotation; the line set is now PINNED, see the
    # _STDOUT_LINE_BUDGET guard below and BASELINE.md "stdout line
    # contract"). Room came from moving the two derivable canary ratios
    # (shared_min_ratio, shared_min_ratio_normalized) to detail-only.
    "pq_index_catchup",
    "dedup_keep_best",     # serves the memoized cluster table; build twin
                           # dedup_cluster_build stays on the line
    # [r17] standing maintenance rows (cold, fixture-scoped, 1 rep — see
    # _bench_maintenance): regressions in the swap/manifest path now
    # surface on the cross-round detail trend line, not only in probes
    "maint_compact_epochs",
    "maint_collection_compact",
    # [r17] new detail rows: cross-corpus jaccard screens + the winnow
    # family (serve + stats); jaccard_between is the from-text twin kept
    # in detail because the line budget is exhausted
    "jaccard_between",
    "jaccard_against_indexed",
    "winnow_index_catchup",
    "winnow_index_stats",
]


# [r18] The stdout line set is PINNED: every query name on the line
# (HEADLINE minus DETAIL_ONLY, tpch_q* collapsed to tpch_total) is a
# driver contract surface — rotating a key off the line breaks the
# driver's per-query cross-round series (it reads as a dropped query:
# r15, r16, and r17/pq_knn_join all did this). New rows may be ADDED to
# DETAIL_ONLY at birth; an existing line key may never move there. The
# budget below is the guard: the driver tail-captures ~2000 chars, and
# tests/test_entry_contract.py pins a worst-plausible-values line under
# it, so growth must be paid for by shrinking non-query fields first.
_STDOUT_LINE_BUDGET = 1900


def _bench_maintenance(spark, sf_dir: str) -> dict[str, float]:
    """One COLD timing each for the two maintenance ops (r16 verdict #6:
    epoch/collection compaction had hand-run scale probes but no standing
    bench presence, so a regression in the swap/manifest path would never
    surface on the cross-round trend line). Fixtures are rebuilt from the
    sf tables in a temp dir per call — fixture build cost excluded, only
    the op is timed. Rows are DETAIL_ONLY (bench_detail.json)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    out: dict[str, float] = {}
    base = tempfile.mkdtemp(prefix="kaer_bench_maint_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # streaming layout: 8 closed epochs + the newest (never touched)
        ep_dir = os.path.join(base, "epochs")
        for e in range(9):
            docs.filter(F.col("doc_id") % 9 == e).coalesce(2).write.mode(
                "overwrite"
            ).parquet(f"{ep_dir}/epoch={e}")
        from kaer_spark.streaming.ingest import compact_ingest_epochs

        t0 = time.time()
        res = compact_ingest_epochs(spark, ep_dir)
        out["maint_compact_epochs"] = round(time.time() - t0, 3)
        if res.get("compacted") != 8:
            print(
                f"WARNING: maint_compact_epochs fixture compacted "
                f"{res.get('compacted')} epochs (expected 8)",
                file=sys.stderr,
            )

        # batch-collection layout: 8 splintered insert batches through the
        # real API (embeddings ride along, so insert_df never embeds)
        from kaer_spark.context import KaerContext

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        corpus = docs.join(emb, docs.doc_id == emb.vec_id).select(
            F.col("text").alias("_m_doc"),
            F.col("embedding").alias("_m_embedding"),
            "lang",
        )
        ctx = KaerContext(spark, os.path.join(base, "kaer"))
        coll = ctx.create_collection("bench_compact", dim=64)
        for b in range(8):
            coll.insert_df(corpus.filter(F.crc32(F.col("_m_doc")) % 8 == b))
        t0 = time.time()
        n_files = coll.compact(target_files=4)
        out["maint_collection_compact"] = round(time.time() - t0, 3)
        if n_files > 4:
            print(
                f"WARNING: maint_collection_compact left {n_files} files",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def stdout_queries(med: dict[str, float]) -> dict[str, float]:
    """Per-query dict for the SIZE-BUDGETED stdout line: the 21 stable
    TPC-H rows collapse into one ``tpch_total`` entry; everything else
    stays per-query. At 70+ headline queries the full dict outgrew the
    driver's ~2000-char tail capture (the r7 `parsed: null` failure mode);
    the full per-query medians AND mins always live in the committed
    bench_detail.json, so nothing is lost — only the stdout line is
    summarized. Membership is deterministic (name prefix), so the driver's
    cross-round series stays comparable. Values round to 2 decimals here
    (10 ms — far below this box's run-to-run jitter; the 3-decimal
    figures live in bench_detail.json) to keep the line inside the
    capture window as the headline set grows."""
    out = {
        "tpch_total": round(
            sum(v for k, v in med.items() if k.startswith("tpch_q")), 2
        )
    }
    out.update(
        {
            k: round(v, 2)
            for k, v in med.items()
            if not k.startswith("tpch_q") and k not in DETAIL_ONLY
        }
    )
    return out


def _machine_load() -> dict:
    """Environment-noise fingerprint recorded alongside the timings, so a
    contaminated run (concurrent pytest, another Spark JVM) is
    self-diagnosing instead of reading as a 2× regression — the round-4
    62.8s episode was exactly this."""
    info: dict = {}
    try:
        info["load_avg_1m"], info["load_avg_5m"], _ = (
            round(x, 2) for x in os.getloadavg()
        )
    except OSError:
        pass
    try:
        info["n_cpus"] = os.cpu_count()
        # other running java/python processes = likely bench contamination
        others = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == os.getpid():
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    comm = f.read().strip()
                if comm in ("java", "python", "python3"):
                    others += 1
            except OSError:
                continue
        info["other_jvm_py_procs"] = others
    except OSError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    info["cpu_model"] = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    # single-core speed canary: a fixed deterministic workload, timed.
    # r11→r12 forensics showed ~1.4-1.9× min inflation on UNTOUCHED queries
    # with byte-identical plans that reproduced in fresh JVMs — i.e. the
    # HOST got slower between rounds, which no load-average can show. This
    # number makes cross-round environment drift a recorded fact: compare
    # cpu_probe_sec before believing any fleet-wide ratio.
    import hashlib

    t0 = time.time()
    h = b"kaer-bench-canary"
    for _ in range(200_000):
        h = hashlib.sha256(h).digest()
    info["cpu_probe_sec"] = round(time.time() - t0, 4)
    # MULTICORE canary (r15): three same-day idle runs measured untouched
    # single queries (fresh JVMs, 5 reps) at 1.3-1.8× the r14 committed
    # mins while the single-core canary got FASTER (0.152 → 0.107) — on
    # these virtualized boxes the single-core probe and the multicore
    # throughput Spark wall time actually rides DECOUPLE. hashlib
    # releases the GIL on >2 KiB buffers, so 8 threads hashing 64 KiB
    # blocks measure real parallel throughput (steal/throttling shows up
    # here, not in the single-core number). Compare BOTH probes before
    # believing any cross-round ratio.
    import threading

    blk = b"\xa5" * 65536
    n_threads, iters = 8, 1500

    def _mc_work():
        b = blk
        for _ in range(iters):
            b = hashlib.sha256(b).digest() + blk[:-32]

    ts = [threading.Thread(target=_mc_work) for _ in range(n_threads)]
    t0 = time.time()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    info["cpu_probe_mc_sec"] = round(time.time() - t0, 4)
    return info


def _rep_fingerprint() -> dict:
    """LIGHT per-rep contamination stamp (r15 verdict #1: the committed
    run started idle and ended at load 5.71 with 35 foreign JVM/python
    procs — a MID-run spike `loaded_start` structurally cannot flag, so
    the medians were polluted while the stdout line stamped itself
    clean). One stamp before every rep: load averages, foreign-proc
    count, and abbreviated single-/multi-core canaries (~0.2s total —
    noise against a multi-minute rep, signal enough for a 2× shift)."""
    import hashlib
    import threading

    info: dict = {}
    try:
        info["load_avg_1m"], info["load_avg_5m"], _ = (
            round(x, 2) for x in os.getloadavg()
        )
    except OSError:
        pass
    try:
        others = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == os.getpid():
                continue
            try:
                with open(f"/proc/{pid}/comm") as f:
                    if f.read().strip() in ("java", "python", "python3"):
                        others += 1
            except OSError:
                continue
        info["other_jvm_py_procs"] = others
    except OSError:
        pass
    t0 = time.time()
    h = b"kaer-bench-canary"
    for _ in range(50_000):
        h = hashlib.sha256(h).digest()
    info["cpu_probe_sec"] = round((time.time() - t0) * 4, 4)  # ×4 ≈ full probe

    blk = b"\xa5" * 65536
    n_threads, iters = 8, 300

    def _mc_work():
        b = blk
        for _ in range(iters):
            b = hashlib.sha256(b).digest() + blk[:-32]

    ts = [threading.Thread(target=_mc_work) for _ in range(n_threads)]
    t0 = time.time()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    info["cpu_probe_mc_sec"] = round((time.time() - t0) * 5, 4)  # ×5 ≈ full
    return info


def _contaminated_reps(rep_loads: list[dict]) -> list[int]:
    """Indices of reps whose fingerprint says the box was NOT the box the
    cleanest rep ran on: loaded by either average (the `_is_loaded` rule),
    or either canary >2× the run's own best. Flagged reps mean the MEDIAN
    is polluted; the min usually survives (it comes from the clean rep)."""
    bad: list[int] = []
    sc = [r.get("cpu_probe_sec") for r in rep_loads if r.get("cpu_probe_sec")]
    mc = [
        r.get("cpu_probe_mc_sec")
        for r in rep_loads
        if r.get("cpu_probe_mc_sec")
    ]
    sc_min = min(sc) if sc else None
    mc_min = min(mc) if mc else None
    for i, r in enumerate(rep_loads):
        loaded = _is_loaded(r)
        sc_bad = bool(
            sc_min and r.get("cpu_probe_sec", 0.0) > 2.0 * sc_min
        )
        mc_bad = bool(
            mc_min and r.get("cpu_probe_mc_sec", 0.0) > 2.0 * mc_min
        )
        if loaded or sc_bad or mc_bad:
            bad.append(i)
    return bad


def _best_probes(*loads: dict) -> tuple[float | None, float | None]:
    """(sc, mc) = the MIN of each canary across the given full-probe
    fingerprints (before/after) — the cleanest instant observed. A single
    instantaneous probe under this box's oscillating foreign-load bursts
    is a coin flip (r16: two back-to-back runs read mc-normalized 0.73
    and 1.28 from the same code because one start-probe landed inside a
    burst); the min is burst-resistant for exactly the reason per-query
    mins are."""
    sc = [d.get("cpu_probe_sec") for d in loads if d.get("cpu_probe_sec")]
    mc = [
        d.get("cpu_probe_mc_sec") for d in loads if d.get("cpu_probe_mc_sec")
    ]
    return (min(sc) if sc else None, min(mc) if mc else None)


def _cross_round_ratios(
    best: dict[str, float], canary: float | None, mc_canary: float | None
) -> dict:
    """Shared-min ratio vs the bench_detail.json present at process start
    (= the previous round's committed detail when the driver runs this),
    raw AND canary-normalized (r13 verdict #5: the committed r13 run sat
    on a ~1.4× faster box than r12's, so the headline 0.86× raw ratio
    overstated the code's contribution and every verdict re-derived the
    correction by hand). ``raw`` assumes the host didn't change;
    ``normalized`` divides by the single-core canary ratio, i.e. assumes
    wall time scales 1:1 with single-core speed — Spark workloads sit
    between the two assumptions, so when the canary moved, RAW and
    NORMALIZED BRACKET the true code contribution (box faster ⇒ raw
    flatters, normalized penalizes; box slower ⇒ the reverse). Read them
    as an interval, not a point.

    [r16] ``_mc`` variants normalize by the MULTICORE canary: r15's
    forensics proved the two probes DECOUPLE on these virtualized boxes
    (untouched rows 1.3–1.8× while the single-core probe got FASTER),
    and Spark wall time rides multicore throughput — so when the two
    normalized ratios disagree, trust the mc one first."""
    out: dict = {
        "shared_min_ratio": None,
        "canary_ratio": None,
        "shared_min_ratio_normalized": None,
        "mc_canary_ratio": None,
        "shared_min_ratio_normalized_mc": None,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_detail.json")
        ) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        return out
    prev_min = prev.get("queries_min") or {}
    shared = sorted(set(prev_min) & set(best))
    if not shared:
        return out
    prev_sum = sum(prev_min[k] for k in shared)
    cur_sum = sum(best[k] for k in shared)
    if prev_sum <= 0:
        return out
    out["shared_min_ratio"] = round(cur_sum / prev_sum, 3)
    out["n_shared"] = len(shared)
    # best-of-run probes on BOTH sides (r16): prefer the prev detail's
    # recorded probe_best; fall back to min(before, after) for details
    # committed before the field existed
    prev_load = prev.get("load") or {}
    prev_sc, prev_mc = _best_probes(
        prev_load.get("before", {}), prev_load.get("after", {})
    )
    pb = prev.get("probe_best") or {}
    prev_sc = pb.get("cpu_probe_sec") or prev_sc
    prev_mc = pb.get("cpu_probe_mc_sec") or prev_mc
    if canary and prev_sc:
        out["canary_ratio"] = round(canary / prev_sc, 3)
        out["shared_min_ratio_normalized"] = round(
            (cur_sum / prev_sum) / (canary / prev_sc), 3
        )
    if mc_canary and prev_mc:
        out["mc_canary_ratio"] = round(mc_canary / prev_mc, 3)
        out["shared_min_ratio_normalized_mc"] = round(
            (cur_sum / prev_sum) / (mc_canary / prev_mc), 3
        )
    return out


def _is_loaded(info: dict) -> bool:
    """A run is "loaded" if EITHER load average says so: the committed r12
    bench started at 5m=4.44 with 1m=1.98 and stamped itself idle while
    running ~15-20% above the idle mid-round numbers (r12 verdict #5) —
    the 1-minute average alone forgives a box that only just quieted."""
    return (
        max(info.get("load_avg_1m", 0.0), info.get("load_avg_5m", 0.0)) > 2.0
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    headline = (
        [n for n in HEADLINE if n in set(only.split(","))] if only else HEADLINE
    )
    if os.environ.get("SPARK_GRAFT_BENCH_FRESH") == "family" and not only:
        return _run_fresh_families(sf_dir, sf)
    # a loaded box inflates every timing (r8: load 4.9→16.2 read as a
    # phantom 1.14× regression; r9/r10 both started loaded and every
    # cross-round comparison carried the noise) — wait, bounded, for the
    # box to go idle before measuring instead of only warning
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT", "600"))
    deadline = time.time() + wait_budget
    load_before = _machine_load()
    while _is_loaded(load_before) and time.time() < deadline:
        print(
            f"bench: box loaded (load_avg_1m="
            f"{load_before.get('load_avg_1m')}, load_avg_5m="
            f"{load_before.get('load_avg_5m')}); waiting for idle "
            f"({int(deadline - time.time())}s left in budget)",
            file=sys.stderr,
        )
        time.sleep(15)
        load_before = _machine_load()
    loaded_start = _is_loaded(load_before)
    if loaded_start:
        print(
            f"WARNING: bench starting on a loaded box after exhausting the "
            f"idle-wait budget (load_avg_1m={load_before.get('load_avg_1m')});"
            f" timings will be inflated — prefer an idle re-run for "
            f"regression calls",
            file=sys.stderr,
        )

    import __spark_entry__ as entrymod
    from kaer_spark.session import get_spark

    spark = get_spark(app_name="kaer-bench")
    qs = entrymod.queries()

    # warm the JVM/session so the first measured query doesn't pay startup
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # per-query MEDIAN of `reps` runs is the primary statistic ("queries"/
    # "value"): this box's documented 1.2-1.4x run-to-run jitter routinely
    # exceeded real deltas when a single run was recorded (7 phantom
    # regressions in round 6). The min is kept alongside ("queries_min"/
    # "value_min") — it is the statistic rounds <= 6 recorded, so
    # cross-round comparisons against BENCH_r06 and earlier should use it.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    import gc
    import random

    # rep-MAJOR with a per-rep seeded shuffle (r12): the old query-major
    # loop gave every query's three reps the same session position, so
    # heap/codegen-state drift over a 77-query session biased late rows
    # consistently across reps — mins couldn't average it out. Shuffling
    # the order per rep (deterministic seeds, so two bench runs are
    # identical) decorrelates session position from query identity; the
    # per-query min then reflects the query, not its slot.
    times: dict[str, list[float]] = {name: [] for name in headline}
    rows: dict[str, int] = {}
    rep_loads: list[dict] = []
    for rep in range(reps):
        rep_loads.append(_rep_fingerprint())
        order = list(headline)
        random.Random(rep).shuffle(order)
        for name in order:
            fn = qs[name]
            spark.catalog.clearCache()  # drop operator-internal persists
            # localCheckpoint RDD blocks (the passage/winnow/CDC plan
            # barriers) are freed by the ContextCleaner only after their
            # RDDs are garbage-collected on BOTH sides; without the nudge
            # they accumulate over 70+ queries x 3 reps and the late-list
            # rows degrade ~3x under block-manager/heap pressure
            # (measured: winnow_overlap 2.1s early-run vs 7.1s late-run)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            rows[name] = fn(spark, sf_dir).count()
            times[name].append(time.time() - t0)
    med: dict[str, float] = {}
    best: dict[str, float] = {}
    for name in headline:
        runs = sorted(times[name])
        med[name] = round(runs[len(runs) // 2], 3)
        best[name] = round(runs[0], 3)
        print(
            f"  {name:28s} med={med[name]:7.3f}s min={best[name]:7.3f}s"
            f"  rows={rows[name]}",
            file=sys.stderr,
        )
    # [r17] the standing maintenance rows (detail-only, cold, 1 rep) —
    # full runs only, so fresh-family children and BENCH_ONLY subsets
    # never pay the fixture build
    if not only:
        maint = _bench_maintenance(spark, sf_dir)
        for name, sec in maint.items():
            med[name] = best[name] = sec
            print(f"  {name:28s} cold={sec:7.3f}s", file=sys.stderr)

    # The driver captures only the TAIL of this process's output and parses
    # the last JSON line out of it. Round 7's line carried queries_min +
    # load and outgrew that buffer -> BENCH_r07.json recorded parsed: null.
    # So the stdout line stays minimal (medians only); the full detail
    # (per-query min, machine load) goes to bench_detail.json + stderr.
    # full runs only: a fresh-family child's subset would compare a
    # partial fleet against the full previous round
    load_after = _machine_load()
    cur_sc, cur_mc = _best_probes(load_before, load_after)
    ratios = (
        _cross_round_ratios(best, cur_sc, cur_mc) if not only else {}
    )
    contaminated = _contaminated_reps(rep_loads)
    # [r17] contamination-FILTERED aggregates (r16 verdict #7): medians/
    # mins over only the reps whose fingerprint was clean, so the
    # headline number itself excludes polluted reps instead of relying
    # on readers to prefer mins. Equal to value/value_min when every rep
    # is clean; None when NO rep is clean (nothing to filter to).
    clean_idx = [i for i in range(reps) if i not in contaminated]
    med_clean: dict[str, float] = {}
    best_clean: dict[str, float] = {}
    if clean_idx:
        for name in headline:
            runs = sorted(times[name][i] for i in clean_idx)
            med_clean[name] = round(runs[len(runs) // 2], 3)
            best_clean[name] = round(runs[0], 3)
        for name in med:
            if name not in times:  # maintenance rows: single cold rep
                med_clean[name] = med[name]
                best_clean[name] = best[name]
    value_clean = round(sum(med_clean.values()), 3) if clean_idx else None
    value_min_clean = (
        round(sum(best_clean.values()), 3) if clean_idx else None
    )
    max_load_seen = max(
        [
            s.get("load_avg_1m", 0.0)
            for s in [load_before, load_after, *rep_loads]
        ]
        or [0.0]
    )
    detail = {
        "runs": reps,
        "queries_med": med,
        "queries_min": best,
        "value": round(sum(med.values()), 3),
        "value_min": round(sum(best.values()), 3),
        "loaded_start": loaded_start,
        # [r16] per-rep fingerprints + the reps they condemn: a mid-run
        # load spike (r15: 0.10 → 5.71 while loaded_start stayed false)
        # now names the polluted reps instead of hiding in the medians
        "rep_loads": rep_loads,
        "contaminated_reps": contaminated,
        "max_load_seen": round(max_load_seen, 2),
        # [r17] clean-rep aggregates: the primary statistic when any rep
        # is condemned (BASELINE.md documents precedence)
        "queries_med_clean": med_clean,
        "queries_min_clean": best_clean,
        "value_clean": value_clean,
        "value_min_clean": value_min_clean,
        "serve_from_artifact": [
            n for n in SERVE_FROM_ARTIFACT if n in headline
        ],
        "cross_round": ratios,
        "load": {"before": load_before, "after": load_after},
        # burst-resistant canaries this run's ratios used, recorded so
        # the NEXT round normalizes against the same statistic
        "probe_best": {"cpu_probe_sec": cur_sc, "cpu_probe_mc_sec": cur_mc},
    }
    if only:
        # child of the fresh-families driver: the parent merges and writes
        # the detail file; emit the machine-readable line and stop
        print(json.dumps(detail), file=sys.stderr)
        print(json.dumps({"queries_med": med, "queries_min": best,
                          "rows": rows, "load": detail["load"]},
                         separators=(",", ":")))
        return 0
    # bench_detail.json is COMMITTED (not gitignored) since r9: the
    # per-query min series — the cross-round comparable — must survive
    # the driver's ~2000-char tail capture, and the stdout line can hold
    # only one per-query dict. The driver's end-of-round snapshot commit
    # carries this file into history.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_detail.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError as exc:
        print(f"WARNING: bench_detail.json not written: {exc}", file=sys.stderr)
    print(json.dumps(detail), file=sys.stderr)

    # LAST stdout line = what the driver parses into BENCH_rN.json. It
    # carries the per-query medians (primary statistic) plus the
    # aggregate min — per-query mins live in the committed detail file.
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(sum(med.values()), 3),
            "value_min": detail["value_min"],
            "unit": "sec",
            "runs": reps,
            "loaded_start": loaded_start,
            # single-core canary (r12: ~27% host drift measured WITHIN one
            # bench) — in the parsed line so no committed total can claim
            # idle conditions its own canary contradicts; since r16 the
            # BEST (min of before/after) probe, matching the ratios
            "cpu_probe_sec": cur_sc,
            # [r16] multicore-normalized shared-min ratio — the PRIMARY
            # cross-round statistic (the probes decouple on these boxes;
            # Spark wall time rides multicore throughput, not single-core
            # speed). [r18] the raw and sc-normalized twins moved to
            # detail-only (cross_round in bench_detail.json) like the raw
            # canary ratios did in r16: both are derivable from the
            # committed detail, and the freed ~59 chars restored
            # pq_knn_join to the line and funded the pinned-line-set
            # guard (r17 verdict #2 — no existing per-query key may ever
            # rotate off the stdout line again).
            "shared_min_ratio_normalized_mc": ratios.get(
                "shared_min_ratio_normalized_mc"
            ),
            # [r16] mid-run contamination, visible ON the parsed line:
            # max 1-min load seen at any fingerprint point and how many
            # of the reps a 2×-probe/load test condemns — a clean line
            # needs BOTH loaded_start=false and contaminated_reps=0
            "max_load_seen": detail["max_load_seen"],
            "contaminated_reps": len(contaminated),
            # [r17] the contamination-filtered total ON the line: when
            # contaminated_reps > 0 this is the number to read (the raw
            # value/value_min keep their cross-round series intact; the
            # min-based clean twin lives in the committed detail file —
            # the stdout budget holds exactly one extra field)
            "value_clean": value_clean,
            "queries": stdout_queries(med),
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        },
        separators=(",", ":"),
    )
    if len(line) > _STDOUT_LINE_BUDGET:
        # NEVER truncate the JSON (a cut line parses as null, the r7
        # failure) — emit loudly so the overflow is fixed by shrinking a
        # non-query field, not by rotating a per-query key off the line
        # (the r15/r16/r17 precedent the pinned set exists to end)
        print(
            f"WARNING: stdout line is {len(line)} chars (budget "
            f"{_STDOUT_LINE_BUDGET}); the driver's ~2000-char tail "
            "capture may cut it — shrink a non-query field, never drop "
            "a per-query key",
            file=sys.stderr,
        )
    print(line)
    return 0


def _family_of(name: str) -> str:
    """Query family = leading name token (tpch_q1 → tpch, dedup_* → dedup):
    coarse enough that a family shares fixture/plan shape, fine enough
    that a fresh JVM per family isolates heap/codegen contamination."""
    return name.split("_", 1)[0]


def _run_fresh_families(sf_dir: str, sf: str) -> int:
    """SPARK_GRAFT_BENCH_FRESH=family: run each query family in its OWN
    python/JVM subprocess — the regression-triage ground truth the shared
    77-query session can't give (r11 #2 / r12 #7: rep-major shuffling
    decorrelates session position, but heap/codegen state still
    accumulates within the one JVM; fresh sessions measure each family
    from a cold, uncontaminated start). Costs one ~6s session startup per
    family (excluded from timings — the child warms up before measuring),
    so it's the forensic mode, not the default."""
    import subprocess

    families: dict[str, list[str]] = {}
    for name in HEADLINE:
        families.setdefault(_family_of(name), []).append(name)
    med: dict[str, float] = {}
    best: dict[str, float] = {}
    child_loads: dict[str, dict] = {}
    for fam, names in families.items():
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(names)
        env.pop("SPARK_GRAFT_BENCH_FRESH", None)
        print(f"bench[fresh]: family {fam} ({len(names)} queries) in a "
              f"fresh JVM", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            print(f"bench[fresh]: family {fam} FAILED", file=sys.stderr)
            return proc.returncode
        payload = json.loads(proc.stdout.strip().splitlines()[-1])
        med.update(payload["queries_med"])
        best.update(payload["queries_min"])
        child_loads[fam] = payload.get("load", {})
    detail = {
        "runs": int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")),
        "fresh_mode": "family",
        "queries_med": {n: med[n] for n in HEADLINE},
        "queries_min": {n: best[n] for n in HEADLINE},
        "value": round(sum(med.values()), 3),
        "value_min": round(sum(best.values()), 3),
        "serve_from_artifact": list(SERVE_FROM_ARTIFACT),
        "load_per_family": child_loads,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_detail_fresh.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError as exc:
        print(f"WARNING: bench_detail_fresh.json not written: {exc}",
              file=sys.stderr)
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps(
        {
            "metric": "headline_queries_total",
            "value": detail["value"],
            "value_min": detail["value_min"],
            "unit": "sec",
            "fresh": "family",
            "queries": stdout_queries(med),
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        },
        separators=(",", ":"),
    ))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
