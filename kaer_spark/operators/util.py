"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition if the input has too few partitions.

    A small parquet table arrives as one split, which serializes
    expression-heavy narrow stages (shingling, hashing) onto a single core.
    On a real multi-TB input this is a no-op — the scan already yields
    hundreds of splits — so the guard only pays the shuffle when the data
    is small enough for the shuffle to be trivially cheap.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def watermark_health_cols(out: DataFrame, wm, corpus, corpus_id_col: str):
    """Staleness columns for an index-stats report, typed by the id
    column's own domain (refreshable indexes bless int AND string ids —
    ``dedup._json_id`` — so a stats surface that ``int()``-coerces the
    watermark raises on every string-keyed index, and ``CAST(<string> AS
    long)`` silently nulls the watermark column).

    * int (or None) watermark: ``watermark`` long + ``watermark_lag``
      long (live max − watermark), the original numeric contract;
    * string watermark: ``watermark`` string + ``is_stale`` boolean via
      the same ordering comparison refresh filters use (a string id's
      "lag" has no magnitude);
    * mixed domains (int index, string corpus or vice versa): loud
      ValueError — the comparison would be meaningless.

    ``corpus=None`` emits only the watermark column."""
    from pyspark.sql import functions as F

    is_int_wm = wm is None or isinstance(wm, int)
    if is_int_wm:
        out = out.withColumn("watermark", F.lit(wm).cast("long"))
    else:
        out = out.withColumn("watermark", F.lit(wm).cast("string"))
    if corpus is None:
        return out
    live_max = corpus.agg(F.max(F.col(corpus_id_col))).collect()[0][0]
    is_int_live = live_max is None or isinstance(live_max, int)
    if is_int_wm and is_int_live:
        lag = (
            int(live_max) - int(wm)
            if live_max is not None and wm is not None
            else 0
        )
        return out.withColumn("watermark_lag", F.lit(lag).cast("long"))
    if not is_int_wm and (live_max is None or isinstance(live_max, str)):
        stale = live_max is not None and (wm is None or live_max > wm)
        return out.withColumn("is_stale", F.lit(bool(stale)))
    raise ValueError(
        f"index watermark ({type(wm).__name__}) and corpus id column "
        f"{corpus_id_col!r} ({type(live_max).__name__}) live in different "
        "domains — staleness comparison would be meaningless"
    )
