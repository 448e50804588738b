"""Format round-trips, partition pruning, bucketed co-located joins."""

import pytest

from pyspark.sql import functions as F

from mapreducegcp_spark.sources.catalog import load_table
from mapreducegcp_spark.sources.formats import (
    read_csv,
    read_json,
    write_bucketed,
    write_csv,
    write_json,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_csv_round_trip(spark, tmp_path):
    src = load_table(spark, SF_DIR, "nation")
    p = str(tmp_path / "nation_csv")
    write_csv(src, p)
    back = read_csv(spark, p, "n_nationkey int, n_name string, n_regionkey int")
    assert sorted(back.collect()) == sorted(src.collect())


def test_json_round_trip(spark, tmp_path):
    src = load_table(spark, SF_DIR, "region")
    p = str(tmp_path / "region_json")
    write_json(src, p)
    back = read_json(spark, p, "r_regionkey long, r_name string")
    assert sorted(back.collect()) == sorted(src.collect())


def test_partition_pruning(spark, tmp_path):
    src = load_table(spark, SF_DIR, "orders")
    p = str(tmp_path / "orders_part")
    write_partitioned(src, p, "o_orderpriority")
    scan = spark.read.parquet(p).where(F.col("o_orderpriority") == "1-URGENT")
    want = src.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert scan.count() == want
    # the partition filter must prune directories, not scan-and-filter
    assert "PartitionFilters: [isnotnull(o_orderpriority" in _physical_plan(scan)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", 4, path=str(tmp_path / "ob"))
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", 4, path=str(tmp_path / "lb"))
    try:
        # disable broadcast so the join strategy is decided by layout
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        plan = _physical_plan(j)
        assert "Exchange" not in plan, plan
        # sanity: co-located join returns the same rows as the shuffled one
        assert j.count() == orders.join(lineitem, "o_orderkey").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_orc_round_trip(spark, tmp_path):
    from mapreducegcp_spark.sources.formats import read_orc, write_orc

    src = load_table(spark, SF_DIR, "supplier")
    p = str(tmp_path / "supplier_orc")
    write_orc(src, p)
    back = read_orc(spark, p)
    assert back.schema == src.schema
    assert sorted(back.collect()) == sorted(src.collect())
