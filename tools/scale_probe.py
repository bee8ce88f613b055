"""Amplification scale probes (SURVEY.md §6): measure how the
scale-sensitive operators behave when the fixture grows 10×, reproducibly.

Method: amplify a fixture by unioning ``times`` copies with id offsets
(vectors optionally rotated per copy so amplified embeddings are distinct
— cloning identical vectors would make the TRUE near-dup pair count
quadratic in copies and mask what the probe measures). Probes:

* ``knn_join`` — corpus 1× vs 10×, 50 broadcast queries: wall time should
  stay ~flat (the WindowGroupLimit pre-exchange fold bounds the shuffle at
  n_partitions × queries × k regardless of corpus size).
* ``pack_sequences`` — 1× vs 10×: sharded cumsum, no global window, ~flat.
* sign-LSH banding — candidate pairs at 1× vs 10× under (a) the FIXED
  (bands=4, bits=4) geometry and (b) ``calibrate_signlsh`` with a pinned
  ``target_bucket_rows``: fixed keeps the candidate FRACTION of the pair
  space constant (quadratic growth); calibrated shrinks it (~linear).

Usage: python tools/scale_probe.py [sf_dir]   # default /root/testdata/sf0.1
Prints one JSON line; human-readable progress on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

TIMES = 10


def amplify(df: DataFrame, id_col: str, times: int, rotate_col: str | None = None):
    """Union `times` copies with disjoint id ranges; optionally rotate the
    vector column by the copy index so copies are distinct vectors."""
    offset = (df.agg(F.max(id_col)).collect()[0][0] or 0) + 1
    parts = []
    for i in range(times):
        part = df.withColumn(id_col, F.col(id_col) + F.lit(i * offset))
        if rotate_col and i:
            n = F.size(rotate_col)
            part = part.withColumn(
                rotate_col,
                F.concat(
                    F.slice(rotate_col, i + 1, n - i), F.slice(rotate_col, 1, i)
                ),
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from kaer_spark.operators.dedup import calibrate_signlsh, signlsh_candidate_pairs
    from kaer_spark.operators.knn import knn_join
    from kaer_spark.operators.packing import pack_sequences
    from kaer_spark.session import get_spark

    spark = get_spark(app_name="kaer-scale-probe")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = (
        embs.orderBy("vec_id").limit(50)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    results: dict = {"sf_dir": sf_dir, "times": TIMES}

    for label, corpus in (("1x", embs), ("10x", amplify(embs, "vec_id", TIMES))):
        # warm once so codegen compile doesn't masquerade as data cost
        knn_join(queries, corpus, k=5, corpus_id_col="vec_id").count()
        t, n = timed(
            lambda c=corpus: knn_join(queries, c, k=5, corpus_id_col="vec_id").count()
        )
        results[f"knn_join_{label}"] = {"sec": t, "rows": n}
        print(f"knn_join {label}: {t}s ({n} rows)", file=sys.stderr)

    from kaer_spark.operators.similarity import ivf_knn_join

    for label, corpus in (("1x", embs), ("10x", amplify(embs, "vec_id", TIMES))):
        ivf_knn_join(
            queries, corpus, k=5, cells=16, nprobe=4, corpus_id_col="vec_id"
        ).count()
        t, n = timed(
            lambda c=corpus: ivf_knn_join(
                queries, c, k=5, cells=16, nprobe=4, corpus_id_col="vec_id"
            ).count()
        )
        results[f"ivf_knn_join_{label}"] = {"sec": t, "rows": n}
        print(f"ivf_knn_join {label}: {t}s ({n} rows)", file=sys.stderr)

    for label, d in (("1x", docs), ("10x", amplify(docs, "doc_id", TIMES))):
        pack_sequences(d, max_tokens=1024, shards=32).count()
        t, n = timed(
            lambda dd=d: pack_sequences(dd, max_tokens=1024, shards=32).count()
        )
        results[f"pack_sequences_{label}"] = {"sec": t, "rows": n}
        print(f"pack_sequences {label}: {t}s ({n} rows)", file=sys.stderr)

    # --- ivf_knn_join under CELL SKEW (round-7 probe: VERDICT r6 #4) ----
    # Build a corpus where ~50% of all vectors collapse into one direction
    # (one hot cell by construction), then run the cell-equi-join kNN join
    # with AQE's skew-join split enabled vs disabled. Thresholds are
    # lowered to fixture scale (the defaults trigger at 256 MB partitions;
    # the hot cell here is ~MBs) — what's probed is the MECHANISM: does
    # the split engage on this join shape, and what does it buy.
    from kaer_spark.operators.similarity import ivf_fit_spread, ivf_knn_join
    from kaer_spark.plans import executed_plan

    amp10 = amplify(embs, "vec_id", TIMES).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    hot_emb = F.transform(
        "embedding",
        lambda x, i: F.when(
            i == 0,
            F.lit(1.0) + F.col("vec_id").cast("double") / F.lit(1e9),
        ).otherwise(x * F.lit(0.001)),
    )
    skewed = amp10.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, hot_emb).otherwise(F.col("embedding")),
    ).localCheckpoint()  # freeze the skewed corpus so each run re-reads it
    # centroids from the PRE-skew corpus: the hot direction then has ONE
    # nearest centroid, so the whole hot mass lands in a single cell — the
    # worst case being probed (fitting on the skewed corpus would sample
    # several hot vectors as centroids and dilute the skew)
    cents = ivf_fit_spread(amp10, "embedding", "vec_id", 16)
    # hot-cell share measured directly on the assignment
    from kaer_spark.operators.similarity import ivf_assign_deterministic

    assigned = ivf_assign_deterministic(skewed, cents)
    shares = assigned.groupBy("_cell").count().collect()
    total_rows = sum(r["count"] for r in shares)
    hot_share = max(r["count"] for r in shares) / total_rows
    results["ivf_skew_hot_cell_share"] = round(hot_share, 3)
    print(f"ivf skew probe: hot cell holds {hot_share:.1%} of corpus",
          file=sys.stderr)

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # force the cell join off the broadcast path (a broadcast join has
        # no shuffled corpus side to skew-split — and at real scale the
        # corpus side could never broadcast anyway)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
        for label, on in (("skewsplit_on", "true"), ("skewsplit_off", "false")):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on)
            out = ivf_knn_join(
                queries, skewed, k=5, cells=16, nprobe=16,
                corpus_id_col="vec_id", centroids=cents,
            )
            out.count()  # warm codegen
            t0 = time.time()
            rows = out.collect()  # collect on the SAME qe → final AQE plan
            t = round(time.time() - t0, 2)
            plan = executed_plan(out)
            engaged = "skew=true" in plan
            results[f"ivf_knn_join_{label}"] = {
                "sec": t, "rows": len(rows), "skew_split_in_plan": engaged,
            }
            print(
                f"ivf_knn_join {label}: {t}s ({len(rows)} rows, "
                f"skew split engaged: {engaged})",
                file=sys.stderr,
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # --- duplicate_passages (round 7): linear-in-chars contract --------
    # Amplified copies share their text, so every window collides across
    # all 10 copies — output (and verify work) scales with TRUE duplicate
    # mass, while the hash/explode cost must stay ~linear in chars.
    from kaer_spark.operators.dedup import duplicate_passages

    for label, d in (("1x", docs), ("10x", amplify(docs, "doc_id", TIMES))):
        duplicate_passages(d, length=24).count()
        t, n = timed(lambda dd=d: duplicate_passages(dd, length=24).count())
        results[f"duplicate_passages_{label}"] = {"sec": t, "rows": n}
        print(f"duplicate_passages {label}: {t}s ({n} windows)", file=sys.stderr)

    # --- remove_duplicate_passages (round 9): the TRANSFORM must keep the
    # report's linear envelope — span merge + rebuild add per-doc window
    # work on the id partitioning, never a pair join. Output rows = docs
    # (constant per input), so unlike the report the 10× run isolates the
    # COMPUTE scaling from output-mass amplification.
    from kaer_spark.operators.dedup import remove_duplicate_passages

    for label, d in (("1x", docs), ("10x", amplify(docs, "doc_id", TIMES))):
        remove_duplicate_passages(d, length=24).count()
        t, n = timed(
            lambda dd=d: remove_duplicate_passages(dd, length=24).count()
        )
        results[f"remove_duplicate_passages_{label}"] = {"sec": t, "rows": n}
        print(
            f"remove_duplicate_passages {label}: {t}s ({n} docs)",
            file=sys.stderr,
        )

    n1 = embs.count()
    amp = amplify(embs, "vec_id", TIMES, rotate_col="embedding")
    for label, d, n in (("1x", embs, n1), ("10x", amp, n1 * TIMES)):
        pair_space = n * (n - 1) / 2
        for mode in ("fixed", "calibrated"):
            if mode == "fixed":
                bands, bits = 4, 4
            else:
                bands, bits = calibrate_signlsh(
                    n, threshold=0.95, target_bucket_rows=256
                )
            t, c = timed(
                lambda dd=d, b=bands, k=bits: signlsh_candidate_pairs(
                    dd, bands=b, bits_per_band=k
                ).count()
            )
            frac = c / pair_space
            results[f"signlsh_{mode}_{label}"] = {
                "sec": t, "candidates": c, "bands": bands, "bits": bits,
                "pair_fraction": round(frac, 6),
            }
            print(
                f"signlsh {mode} {label}: {t}s, {c} candidates "
                f"(bands={bands}, bits={bits}, fraction={frac:.2%})",
                file=sys.stderr,
            )

    # --- round-11 probes: constant Bloom broadcast, bounded HLL/CMS
    # state, linear CDC ------------------------------------------------
    from kaer_spark.operators.contamination import bloom_build, bloom_decontaminate
    from kaer_spark.operators.dedup import cdc_dedup_stats
    from kaer_spark.operators.sketches import hll_registers

    test = docs.filter(F.col("doc_id") % 97 == 0)
    for label, t_side in (("1x", test), ("10x", amplify(test, "doc_id", TIMES))):
        row = bloom_build(t_side, n=3, m_bits=1 << 16).collect()[0]
        results[f"bloom_bitset_{label}"] = {
            "n_words": len(row["words"]), "n_set_bits": int(row["n_set_bits"])
        }
        print(
            f"bloom bitset {label}: {len(row['words'])} words "
            f"({row['n_set_bits']} bits set) — broadcast size CONSTANT in "
            f"eval-set size",
            file=sys.stderr,
        )
    for label, d in (("1x", docs), ("10x", amplify(docs, "doc_id", TIMES))):
        bloom_decontaminate(d, test, n=3, m_bits=1 << 16).count()
        t, n = timed(
            lambda dd=d: bloom_decontaminate(
                dd, test, n=3, m_bits=1 << 16
            ).count()
        )
        results[f"bloom_decontam_{label}"] = {"sec": t, "rows": n}
        print(f"bloom_decontaminate {label}: {t}s ({n} rows)", file=sys.stderr)

    from kaer_spark.functions.text import tokens as _tok

    for label, d in (("1x", docs), ("10x", amplify(docs, "doc_id", TIMES))):
        toks = d.select(F.explode(_tok(F.col("text"))).alias("v"))
        regs = hll_registers(toks, "v", p=12)
        t, n = timed(lambda r=regs: r.count())
        results[f"hll_registers_{label}"] = {"sec": t, "rows": n}
        print(
            f"hll_registers {label}: {t}s ({n} rows — state bounded by 2^p "
            f"regardless of corpus size)",
            file=sys.stderr,
        )

    for label, d in (("1x", docs), ("10x", amplify(docs, "doc_id", TIMES))):
        cdc_dedup_stats(d).count()
        t, n = timed(lambda dd=d: cdc_dedup_stats(dd).count())
        results[f"cdc_stats_{label}"] = {"sec": t, "rows": n}
        print(f"cdc_dedup_stats {label}: {t}s", file=sys.stderr)

    # --- round-12 probes: at-rest PQ serving, PPS sampling --------------
    # pq_index SERVE time: build once per size (not timed — the index is
    # at rest), then probe. The shortlist stage scans only (id, pq_code)
    # in the probed cells, so serve cost grows with the probed code mass
    # (nprobe/cells of m ints per vector), nowhere near raw-vector scan.
    import tempfile

    from kaer_spark.operators.index_store import build_pq_index, pq_index_topk

    qvec = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
    for label, d in (("1x", embs), ("10x", amplify(embs, "vec_id", TIMES,
                                                   rotate_col="embedding"))):
        path = tempfile.mkdtemp(prefix=f"kaer_probe_pq_{label}_")
        build_pq_index(d, path, m=8, k=16, cells=8)
        pq_index_topk(spark, path, d, qvec, topk=10, shortlist=50, nprobe=3).count()
        t, n = timed(
            lambda p=path, dd=d: pq_index_topk(
                spark, p, dd, qvec, topk=10, shortlist=50, nprobe=3
            ).count()
        )
        results[f"pq_index_serve_{label}"] = {"sec": t, "rows": n}
        print(f"pq_index serve {label}: {t}s", file=sys.stderr)

    # --- round-13 probe: indexed hard-negative mining -------------------
    # ivf_hard_negatives at fixed nprobe: mining cost should track the
    # probed corpus fraction, not the full corpus × queries product the
    # broadcast miner pays — the property that makes it the per-epoch
    # re-mining path.
    from kaer_spark.operators.knn import ivf_hard_negatives

    for label, d in (("1x", embs), ("10x", amplify(embs, "vec_id", TIMES,
                                                   rotate_col="embedding"))):
        ivf_hard_negatives(
            queries, d.select(F.col("vec_id").alias("doc_id"), "embedding"),
            k=5, cells=16, nprobe=4, metric="cosine", dup_ceiling=0.9999,
        ).count()
        t, n = timed(
            lambda dd=d: ivf_hard_negatives(
                queries,
                dd.select(F.col("vec_id").alias("doc_id"), "embedding"),
                k=5, cells=16, nprobe=4, metric="cosine", dup_ceiling=0.9999,
            ).count()
        )
        results[f"ivf_hard_negatives_{label}"] = {"sec": t, "rows": n}
        print(f"ivf_hard_negatives {label}: {t}s ({n} rows)", file=sys.stderr)

    # --- round-14 probe: the triplet-assembly composition ----------------
    # contrastive_triplets at the PRODUCTION shape (partial probe,
    # bench row contrastive_triplets_mine): the chain is LSH pair gen
    # (calibrated banding — ~linear candidates) → closure (O(diameter)
    # iterations over the pairs-sized edge set) → indexed mining (probed
    # fraction of corpus × anchors). Every stage is sub-quadratic, so the
    # 10× ratio should land far under 100× — the number this probe pins.
    # Geometry fixed (cells=8, nprobe=3) as in the bench row; a production
    # deployment would scale cells ~ sqrt(N), which only helps.
    from kaer_spark.operators.dedup import dedup_clusters, embedding_near_dups_lsh
    from kaer_spark.operators.knn import contrastive_triplets

    def run_triplets(d: DataFrame) -> int:
        pairs = embedding_near_dups_lsh(
            d, threshold=0.35, bands=4, bits_per_band=4, seed=7
        ).select("id_a", "id_b")
        clusters = dedup_clusters(pairs)
        return contrastive_triplets(
            d.select("vec_id", "embedding"), clusters,
            k_negatives=3, cells=8, nprobe=3, metric="cosine",
        ).count()

    for label, d in (("1x", embs), ("10x", amplify(embs, "vec_id", TIMES,
                                                   rotate_col="embedding"))):
        run_triplets(d)  # warm codegen
        t, n = timed(lambda dd=d: run_triplets(dd))
        results[f"contrastive_triplets_{label}"] = {"sec": t, "rows": n}
        print(f"contrastive_triplets {label}: {t}s ({n} rows)",
              file=sys.stderr)

    # --- round-14 probe: streaming near-dup ingest serve cost ------------
    # neardup_ingest_batch with a FIXED novel batch against a 1x vs 10x
    # at-rest MinHash index: per-batch cost = batch signature pass + the
    # band equi-join against stored keys + the batch-sized refresh append.
    # [r15] the replay path no longer recomputes (a committed epoch whose
    # ids sit at-or-below the watermark returns immediately — the
    # partition is provably final), so the timed call now CLONES the
    # built index and ingests fresh: the honest recurring per-batch cost,
    # screen + self-dedup + write + append. Amplified reference copies
    # get a per-copy text suffix so the clone mass doesn't inflate true
    # collisions; the batch's vowels are substituted so it is novel
    # (the production regime — most arrivals survive).
    import shutil
    import tempfile as _tf

    from kaer_spark.operators.dedup import build_minhash_index
    from kaer_spark.streaming.ingest import neardup_ingest_batch

    base_docs = docs.select("doc_id", "text")

    def amp_docs_distinct(d: DataFrame, times: int) -> DataFrame:
        off = (d.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
        parts = [
            d.withColumn("doc_id", F.col("doc_id") + F.lit(i * off))
            .withColumn(
                "text", F.concat(F.col("text"), F.lit(f" uniquetail{i}" * 3))
            )
            for i in range(times)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    novel = base_docs.filter(F.col("doc_id") % 11 == 0).withColumn(
        "text", F.translate("text", "aeiou", "xqzvw")
    )
    for label, ref in (
        ("1x", base_docs), ("10x", amp_docs_distinct(base_docs, TIMES))
    ):
        ref_max = ref.agg(F.max("doc_id")).collect()[0][0]
        idx_path = _tf.mkdtemp(prefix=f"kaer_probe_mhidx_{label}_")
        build_minhash_index(ref, idx_path, n=8, num_hashes=16, bands=4, seed=42)
        batch = novel.withColumn(
            "doc_id", F.col("doc_id") + F.lit(ref_max + 1)
        ).localCheckpoint()

        def ingest_fresh(ix=idx_path, b=batch):
            clone = _tf.mkdtemp(prefix="kaer_probe_mhclone_")
            shutil.rmtree(clone)
            shutil.copytree(ix, clone)
            od = _tf.mkdtemp(prefix="kaer_probe_ingest_")
            neardup_ingest_batch(b, 0, clone, od)
            n = spark.read.parquet(os.path.join(od, "epoch=0")).count()
            shutil.rmtree(clone, ignore_errors=True)
            shutil.rmtree(od, ignore_errors=True)
            return n

        ingest_fresh()  # warm codegen
        t, n_surv = timed(ingest_fresh)
        results[f"stream_neardup_batch_{label}"] = {
            "sec": t, "survivors": n_surv,
        }
        print(
            f"stream_neardup_batch {label}: {t}s fresh ingest "
            f"({n_surv} survivors)",
            file=sys.stderr,
        )
        shutil.rmtree(idx_path, ignore_errors=True)

    # --- round-15 probe: shingle-index refresh is TAIL-bound -------------
    # refresh_shingle_index appends one fixed-size tail onto a 1x vs 10x
    # built index: the per-id appends scan only the tail (plus id-pruned
    # ghost scans of the index above the watermark), the df segment
    # derives from the on-disk postings window, and only the HOT-set
    # recompute touches corpus-global state (a groupBy over the df
    # segments — (g, cnt) rows, far smaller than postings). Cost should
    # grow far sub-linearly in index size; a refresh that secretly
    # re-scanned the corpus would go ~10x.
    from kaer_spark.operators.dedup import (
        build_shingle_index,
        refresh_shingle_index,
    )

    sh_tail = base_docs.filter(F.col("doc_id") % 13 == 0).withColumn(
        "text", F.translate("text", "aeiou", "zzzzz")
    )
    for label, ref in (
        ("1x", base_docs), ("10x", amp_docs_distinct(base_docs, TIMES))
    ):
        ref_max = ref.agg(F.max("doc_id")).collect()[0][0]
        sidx = _tf.mkdtemp(prefix=f"kaer_probe_shidx_{label}_")
        build_shingle_index(ref, sidx, n=8, max_doc_freq=100)
        tail = sh_tail.withColumn(
            "doc_id", F.col("doc_id") + F.lit(ref_max + 1)
        ).localCheckpoint()
        union = ref.unionByName(tail)

        def refresh_once(u=union, ix=sidx):
            clone = _tf.mkdtemp(prefix="kaer_probe_shclone_")
            shutil.rmtree(clone)
            shutil.copytree(ix, clone)
            refresh_shingle_index(u, clone)
            shutil.rmtree(clone, ignore_errors=True)
            return 0

        refresh_once()  # warm codegen
        t, _ = timed(refresh_once)
        results[f"shingle_refresh_{label}"] = {"sec": t}
        print(f"shingle_refresh {label}: {t}s (fixed tail)", file=sys.stderr)
        shutil.rmtree(sidx, ignore_errors=True)

    # pps: one range shuffle + bounded offsets — ~linear in rows, and the
    # selected count stays ~k regardless of corpus size
    from kaer_spark.operators.sampling import pps_systematic_sample

    for label, d in (("1x", docs), ("10x", amplify(docs, "doc_id", TIMES))):
        pps_systematic_sample(d, 97, "n_chars").count()
        t, n = timed(
            lambda dd=d: pps_systematic_sample(dd, 97, "n_chars").count()
        )
        results[f"pps_sample_{label}"] = {"sec": t, "rows": n}
        print(f"pps_sample {label}: {t}s ({n} rows — ~k at any size)",
              file=sys.stderr)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
