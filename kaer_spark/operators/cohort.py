"""Cohort retention analysis over the events stream.

The classic product-analytics rollup the events table exists for: group
users by the period they first appeared (their cohort), then count how many
of each cohort are still active N periods later. Emits the (cohort,
offset) → distinct-user matrix that a retention heatmap reads directly.

Scale shape: one shuffle keyed by user for the first-seen window, then the
distinct-user count is a (cohort_period, offset) aggregate over the
already-deduplicated (user, period) pairs — both exchanges are keyed on
high-cardinality columns, and all period arithmetic is integer epoch-nanos
division (exact, oracle-replayable; timestamps normalized through the
engine-wide functions/time definition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaer_spark.functions.time import NS_PER_DAY, normalize_epoch_ns

NS_PER_WEEK = 7 * NS_PER_DAY


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_ns: int = NS_PER_WEEK,
) -> DataFrame:
    """(cohort_period, period_offset, n_users) retention matrix.

    ``cohort_period`` is the user's first-seen period index
    (``min(ts) DIV period``); ``period_offset`` ≥ 0 counts periods since.
    Offset 0 rows give each cohort's size, so downstream can derive rates
    without a second pass.
    """
    ev = normalize_epoch_ns(events, ts_col)
    # integer DIV, not `/`: long / long is a double in Spark, and epoch-nanos
    # (~1.7e18) exceed double's 2^53 exact-integer range
    period = F.expr(f"{ts_col} DIV {int(period_ns)}")
    active = (
        ev.select(F.col(user_col).alias("user"), period.alias("period"))
        .withColumn("cohort", F.min("period").over(Window.partitionBy("user")))
        .select("user", "cohort", (F.col("period") - F.col("cohort")).alias("offset"))
        .distinct()
    )
    return active.groupBy(
        F.col("cohort").alias("cohort_period"),
        F.col("offset").alias("period_offset"),
    ).agg(F.countDistinct("user").alias("n_users"))
