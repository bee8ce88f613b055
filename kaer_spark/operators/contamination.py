"""Benchmark-contamination detection: which training documents contain
word n-grams that also occur in an evaluation/test set.

This is the standard decontamination primitive for LLM training corpora
(exact n-gram collision, as used by GPT-3/PaLM data pipelines: a training
doc is contaminated if it shares any length-``n`` word n-gram with a
benchmark document). The reference engine has no such operator; it belongs
to the training-data-pipeline surface this repo adds as first-class.

Design for 100 TB:

* The *test* side is a benchmark suite — thousands of documents, MBs — so
  its distinct gram set is **broadcast**; the multi-TB train side is never
  shuffled for the probe: the gram explode + broadcast-hash semi-probe
  pipeline inside the train scan stage.
* The only shuffle is the final ``groupBy(train id)`` over *matching*
  grams, which the broadcast join has already cut to a tiny fraction of
  the corpus.
* Per-doc gram arrays are distinct (``word_shingles(distinct=True)``), so
  hit counts need no ``count(distinct)`` — a plain map-side-combinable
  ``count(*)``.

Pure Catalyst end to end: no Python UDF, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kaer_spark.functions.text import char_shingles, word_shingles


def _grams(text_col: str, n: int, unit: str) -> Column:
    if unit == "word":
        return word_shingles(text_col, n=n, distinct=True)
    if unit == "char":
        return char_shingles(text_col, n=n, distinct=True)
    raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")


def contamination_pairs(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    unit: str = "word",
) -> DataFrame:
    """(train ``doc_id``, test ``test_doc_id``, ``shared_grams``) for every
    train/test pair sharing at least one distinct word n-gram.

    ``n=13`` is the published decontamination default (GPT-3 appendix C);
    lower it for short-document corpora.
    """
    tr = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_grams(text_col, n, unit)).alias("g"),
    )
    te = test.select(
        F.col(id_col).alias("test_doc_id"),
        F.explode(_grams(text_col, n, unit)).alias("g"),
    )
    return (
        tr.join(F.broadcast(te), "g")
        .groupBy("doc_id", "test_doc_id")
        .agg(F.count("*").alias("shared_grams"))
    )


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    unit: str = "word",
) -> DataFrame:
    """Per contaminated train doc: (``doc_id``, ``hits``) where ``hits`` is
    the number of *distinct* train-doc grams that occur anywhere in the
    test set. Docs with zero hits are absent (anti-join them to get the
    clean corpus)."""
    tr = train.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_grams(text_col, n, unit)).alias("g"),
    )
    te = test.select(F.explode(_grams(text_col, n, unit)).alias("g")).distinct()
    return (
        tr.join(F.broadcast(te), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("hits"))
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    unit: str = "word",
) -> DataFrame:
    """Train corpus with contaminated documents removed — a broadcast
    LEFT ANTI join against the contaminated-id set, so the clean pass over
    the corpus stays scan-shaped."""
    bad = contamination_report(train, test, text_col, id_col, n, unit).select("doc_id")
    return train.join(
        F.broadcast(bad), train[id_col] == bad["doc_id"], "left_anti"
    )


def overlap_fraction(
    eval_df: DataFrame,
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    unit: str = "word",
) -> DataFrame:
    """Per EVAL document: what fraction of its distinct n-grams also occur
    anywhere in the training corpus →
    ``(doc_id, n_grams, n_overlapping, overlap_frac)``.

    The memorization-risk number eval cards report (complement of
    novelty): ``contamination_report`` answers "which TRAIN docs touch the
    benchmark"; this answers "how much of each EVAL item is reproducible
    from training text" — 1.0 means every n-gram of the item appears in
    training data, 0.0 means fully novel. Docs too short to have a single
    n-gram are emitted with ``n_grams = 0`` and NULL fraction.

    Scale shape — the sides flip relative to decontamination: the
    multi-TB side here is the TRAIN gram set, far too big to broadcast,
    so the probe is a gram-keyed LEFT SEMI join (eval grams, a bounded
    benchmark, shuffle as the small side; the train grams arrive at the
    join pre-deduplicated by a keyed ``distinct`` whose exchange is the
    one full-corpus shuffle). The fraction is exact integer counting:
    distinct grams per doc over distinct matched grams.
    """
    from kaer_spark.operators.util import ensure_parallelism

    ev = eval_df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_grams(text_col, n, unit)).alias("g"),
    )
    # the train-side explode is the heavy stage; on a fixture-scale
    # single-file scan it would otherwise run in ONE task (measured
    # 12.7s -> ~2s at sf0.1) — a no-op on real partitioned inputs
    tg = (
        ensure_parallelism(train)
        .select(F.explode(_grams(text_col, n, unit)).alias("g"))
        .distinct()
    )
    totals = ev.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        ev.join(tg, "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlapping"))
    )
    return (
        eval_df.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_overlapping", F.lit(0)).alias("n_overlapping"),
            (
                F.coalesce("n_overlapping", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double")
            ).alias("overlap_frac"),
        )
    )
