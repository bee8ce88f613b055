"""A/B: plain shuffle join vs bucketed co-located join on the TPC-H
orders⋈lineitem spine.

Usage: python tools/bench_bucketed.py [sf_dir] [num_buckets]

Writes orders and lineitem as identically-bucketed managed tables (one-time
layout cost, amortized over every later query of a recurring workload),
then times the revenue-per-order join+agg both ways and counts shuffle
exchanges in each physical plan. The point being demonstrated for the
100 TB design: the bucketed plan removes BOTH fact-side shuffles from
every recurring join on the bucket key — at cluster scale that is the
difference between a network-bound job and a map-side merge.

Prints one JSON line: {"plain_sec", "bucketed_sec", "plain_exchanges",
"bucketed_exchanges", "write_sec", "sf", "buckets"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kaer_spark.session import get_spark  # noqa: E402
from kaer_spark.sources.files import write_bucketed  # noqa: E402


def revenue_join(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("revenue")
        )
    )


def n_shuffles(df: DataFrame) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def timed_count(df: DataFrame) -> tuple[float, int]:
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark(app_name="bench-bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # isolate the effect

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    plain = revenue_join(orders, lineitem)
    plain_sec, n_plain = timed_count(plain)

    t0 = time.time()
    write_bucketed(orders, "ab_orders", ["o_orderkey"], buckets)
    write_bucketed(lineitem, "ab_lineitem", ["l_orderkey"], buckets)
    write_sec = time.time() - t0

    b_orders = spark.table("ab_orders")
    b_lineitem = spark.table("ab_lineitem")
    bucketed = revenue_join(b_orders, b_lineitem)
    bucketed_sec, n_bucketed = timed_count(bucketed)

    assert n_plain == n_bucketed, (n_plain, n_bucketed)
    out = {
        "plain_sec": round(plain_sec, 3),
        "bucketed_sec": round(bucketed_sec, 3),
        "plain_exchanges": n_shuffles(plain),
        "bucketed_exchanges": n_shuffles(bucketed),
        "write_sec": round(write_sec, 3),
        "rows": n_plain,
        "sf": sf_dir,
        "buckets": buckets,
    }
    for t in ("ab_orders", "ab_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
