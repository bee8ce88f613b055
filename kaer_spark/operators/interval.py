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
