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
