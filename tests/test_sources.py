"""File source/sink round-trips + partitioned-write layout checks."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from kaer_spark.sources import (
    read_csv,
    read_jsonl,
    read_parquet,
    write_partitioned,
)
from kaer_spark.sources.files import open_table


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(i, f"name{i}", ["a", "b"][i % 2], float(i) / 4) for i in range(40)],
        "id long, name string, grp string, score double",
    )


def test_csv_roundtrip(spark, small, tmp_path):
    p = str(tmp_path / "csv")
    small.write.option("header", "true").csv(p)
    back = read_csv(spark, p, "id long, name string, grp string, score double")
    assert back.count() == 40
    assert sorted(r["id"] for r in back.collect()) == list(range(40))
    assert dict(back.dtypes)["score"] == "double"  # schema applied, not inferred


def test_jsonl_roundtrip(spark, small, tmp_path):
    p = str(tmp_path / "jsonl")
    small.write.json(p)
    back = read_jsonl(spark, p, "id long, name string, grp string, score double")
    assert back.count() == 40
    assert back.filter(F.col("grp") == "a").count() == 20


def test_partitioned_write_layout(spark, small, tmp_path):
    p = str(tmp_path / "pq")
    write_partitioned(small, p, partition_by=["grp"])
    assert sorted(
        d for d in os.listdir(p) if d.startswith("grp=")
    ) == ["grp=a", "grp=b"]
    back = read_parquet(spark, p)
    assert back.count() == 40
    # partition pruning: only one directory scanned for a partition filter
    from kaer_spark.plans import executed_plan

    plan = executed_plan(back.filter(F.col("grp") == "a"))
    assert "PartitionFilters" in plan and "grp" in plan


def test_lakehouse_formats_gated(spark, tmp_path):
    for fmt in ("delta", "avro"):
        with pytest.raises(NotImplementedError):
            open_table(spark, fmt, str(tmp_path / "nope"))


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed identically on the join key must join without an
    Exchange on either side — the co-located-join layout for 100 TB
    fact-fact joins."""
    from kaer_spark.plans import executed_plan
    from kaer_spark.sources.files import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    try:
        write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
        write_bucketed(li, "b_lineitem", ["l_orderkey"], 8)
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        j = bl.join(
            bo.hint("merge"), bl.l_orderkey == bo.o_orderkey
        ).groupBy("o_orderstatus").count()
        plan = executed_plan(j)
        join_part = plan.split("SortMergeJoin")[-0] if "SortMergeJoin" in plan else plan
        # no shuffle below the join: the only allowed Exchange is the one
        # ABOVE it for the final groupBy
        assert "SortMergeJoin" in plan
        below = plan[plan.index("SortMergeJoin"):]
        assert "Exchange hashpartitioning" not in below
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_orc_roundtrip_and_pushdown(spark, small, tmp_path):
    from kaer_spark.sources.files import read_orc

    p = str(tmp_path / "orc")
    small.write.orc(p)
    back = read_orc(spark, p, columns=["id", "grp"])
    assert sorted(r["id"] for r in back.collect()) == list(range(40))
    plan = (
        read_orc(spark, p).filter(F.col("id") > 30)._jdf.queryExecution()
        .executedPlan().toString()
    )
    # predicate reaches the ORC scan, projection prunes columns
    assert "PushedFilters" in plan and "GreaterThan(id,30)" in plan


def test_text_reader_lines_and_wholefile(spark, tmp_path):
    from kaer_spark.sources.files import read_text

    d = tmp_path / "txt"
    os.makedirs(d)
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo\n")
    lines = read_text(spark, str(d))
    assert sorted(r["value"] for r in lines.collect()) == [
        "line one", "line two", "solo",
    ]
    docs = read_text(spark, str(d), whole_file=True)
    assert docs.count() == 2
    assert any("line one\nline two" in r["value"] for r in docs.collect())
