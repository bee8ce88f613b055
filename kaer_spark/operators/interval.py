"""Interval (range-band) join: pair left rows with right rows whose
timestamp falls in ``[left_ts + lower, left_ts + upper)``, co-keyed on
equality columns.

The reference has no joins at all (SURVEY.md §2.3 — "no range/as-of/
interval joins"); this is the extension surface. Sibling operator:
``operators.asof`` (latest-right-before-left instead of all-in-band).

Scale design (100 TB): the join is an *equi*-join on ``keys`` with the band
as a post-join filter — one hash shuffle per side, never a cross product.
Catalyst evaluates the band predicate inside the join operator, so the
blow-up is bounded by rows-per-key × band width. Skewed keys are handled by
AQE skew-join splitting. For band joins WITHOUT an equality key, bucketize
time into ``ceil(band / bucket)``-sized buckets and join on the bucket id
(each left row probes 2 buckets) — ``time_bucket_join`` below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    how: str = "inner",
) -> DataFrame:
    """Join right rows with ``left_ts + lower <= right_ts < left_ts + upper``.

    ``lower``/``upper`` are in the units of the timestamp columns (the
    fixtures carry int64 nanos; plain integer arithmetic keeps the predicate
    exact and oracle-replayable).
    """
    lal, ral = left.alias("l"), right.alias("r")
    band = (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + F.lit(lower)) & (
        F.col(f"r.{right_ts}") < F.col(f"l.{left_ts}") + F.lit(upper)
    )
    on = band
    for k in keys:
        on = (F.col(f"l.{k}") == F.col(f"r.{k}")) & on
    return lal.join(ral, on, how)


def time_bucket_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band: int,
) -> DataFrame:
    """INNER band join with NO equality key: bucket time by the band width
    and equi-join on bucket id (left probes its own and the previous
    bucket, so every pair within ``[left_ts - band, left_ts]`` meets
    exactly once).

    Inner-only by construction: each left row is exploded into two bucket
    probes before the join, so an outer join would null-extend the probe
    copies and emit duplicate / spurious unmatched rows.

    This is the scale path for global time-band joins: shuffle is keyed on
    time buckets (bounded fan-out of 2), not a cross product.
    """
    how = "inner"
    lb = left.withColumn(
        "_bkt", F.explode(F.array(F.floor(F.col(left_ts) / band), F.floor(F.col(left_ts) / band) - 1))
    )
    rb = right.withColumn("_bkt", F.floor(F.col(right_ts) / band))
    cond = (
        (lb["_bkt"] == rb["_bkt"])
        & (rb[right_ts] >= lb[left_ts] - F.lit(band))
        & (rb[right_ts] <= lb[left_ts])
    )
    return lb.join(rb, cond, how).drop("_bkt")


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Per key, coalesce overlapping/touching half-open intervals
    ``[start, end)`` into maximal islands → ``(*key_cols, island_start,
    island_end, n_merged)``.

    The gaps-and-islands primitive the passage-excision transform uses
    internally (``dedup._excise_spans``' span merge), exposed as a public
    operator: uptime/coverage from heartbeat windows, session spans from
    padded events, availability windows from bookings. Classic one-pass
    formulation — an island starts where ``start`` exceeds the running
    max of previous ends — so the cost is ONE shuffle on the keys and two
    window passes; no self-join, no explosion, and the running max is
    size-independent state (at 100 TB the shuffle carries exactly the
    interval rows, nothing quadratic).

    Intervals where ``end <= start`` are rejected loudly rather than
    silently merged (a reversed interval corrupts the running max)."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    s = F.col(start_col)
    # the guard is woven into the END value itself (a pruned side-channel
    # check column would be optimized away and never evaluated)
    e_checked = F.when(F.col(end_col) > s, F.col(end_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("merge_intervals: end <= start for key "),
                F.concat_ws(",", *[F.col(c).cast("string") for c in key_cols]),
            )
        )
    )
    checked = df.withColumn(end_col, e_checked)
    e = F.col(end_col)
    w_order = Window.partitionBy(*key_cols).orderBy(
        s.asc(), e.asc()
    )
    prev_max_end = F.max(e).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = checked.withColumn(
        "__new_island",
        F.when(prev_max_end.isNull() | (s > prev_max_end), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "__island",
        F.sum("__new_island").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy(*key_cols, "__island")
        .agg(
            F.min(s).alias("island_start"),
            F.max(e).alias("island_end"),
            F.count("*").cast("long").alias("n_merged"),
        )
        .drop("__island")
    )


def interval_coverage(
    df: DataFrame,
    key_cols: list[str],
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Per key: total covered span, island count, and largest gap between
    islands → ``(*key_cols, covered, n_islands, max_gap)`` (``max_gap``
    NULL for single-island keys) — the uptime/SLA accounting readout over
    :func:`merge_intervals`."""
    isl = merge_intervals(df, key_cols, start_col, end_col)
    w = Window.partitionBy(*key_cols).orderBy(F.col("island_start").asc())
    gap = F.col("island_start") - F.lag("island_end").over(w)
    with_gap = isl.withColumn("__gap", gap)
    return with_gap.groupBy(*key_cols).agg(
        F.sum(
            F.col("island_end") - F.col("island_start")
        ).cast("long").alias("covered"),
        F.count("*").cast("long").alias("n_islands"),
        F.max("__gap").cast("long").alias("max_gap"),
    )
