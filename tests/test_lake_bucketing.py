"""Bucketed co-located joins: the write-once-shuffle-never contract.

The 100 TB claim in sources/lake.py is a plan property, so pin it as
one: two tables bucketed identically on the join key must join with
ZERO Exchange nodes (the shuffle happened at write time), and the
result must equal the plain shuffled join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_example_spark.sources.catalog import load_table
from cdc_example_spark.sources.lake import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("lake")
    orders = load_table(spark, sf_dir, "orders", cache=False)
    li = load_table(spark, sf_dir, "lineitem", cache=False)
    write_bucketed(orders, "orders_b", str(base / "orders"), "o_orderkey", 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        str(base / "lineitem"),
        "o_orderkey",
        8,
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_plans_zero_exchanges(spark, bucketed):
    o, l = bucketed
    # force a non-broadcast join so the exchange question is real
    joined = (
        read_bucketed(spark, o).hint("merge")
        .join(read_bucketed(spark, l).hint("merge"), "o_orderkey")
        .select("o_orderkey", "o_totalprice", "l_extendedprice")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_bucketed_join_equals_plain_join(spark, sf_dir, bucketed):
    o, l = bucketed
    got = (
        read_bucketed(spark, o).hint("merge")
        .join(read_bucketed(spark, l).hint("merge"), "o_orderkey")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,2)")).alias("s"),
        )
        .collect()[0]
    )
    orders = load_table(spark, sf_dir, "orders", cache=False)
    li = load_table(spark, sf_dir, "lineitem", cache=False)
    want = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,2)")).alias("s"),
        )
        .collect()[0]
    )
    assert (got.n, got.s) == (want.n, want.s)


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path_factory):
    from cdc_example_spark.sources.lake import write_partitioned

    base = str(tmp_path_factory.mktemp("part") / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders", cache=False)
    write_partitioned(orders, base, "o_orderstatus")

    back = spark.read.parquet(base)
    pruned = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (directory pruning),
    # not merely PushedFilters (row-group skipping)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200], plan[:1500]
    n = pruned.count()
    want = orders.filter(F.col("o_orderstatus") == "F").count()
    assert n == want > 0
