"""Bucketed tables: the pre-shuffled-storage path for co-located joins.

At 100 TB the orders⋈lineitem equi-join is the expensive exchange — both
sides shuffle on orderkey every query. Bucketing pays that shuffle ONCE at
write time: both tables hash-clustered into the same bucket count on the
join key satisfy the join's distribution requirement directly from the
scan, so repeated joins run with ZERO exchanges. This is storage-level
join co-location (Hive/Iceberg bucketing, the same idea as the
reference's per-state output partitioning taken to join keys).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.catalog import load_table
from amazon_climate_data_etl_spark.plans import inspect as I

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    load_table(spark, SF, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("orders_bkt")
    load_table(spark, SF, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("lineitem_bkt")
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_runs_without_exchange(spark, bucketed_tables):
    """Same bucket count + join on the bucket key → the sort-merge join's
    distribution requirement is met by the scans; no Exchange anywhere."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("lineitem_bkt")
            .join(
                spark.table("orders_bkt"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = I.plan_string(j, "simple")
        # the ONLY exchange is the final 1-key aggregate; the join itself
        # runs shuffle-free off the bucketed scans
        assert I.shuffle_count(plan) == 1, plan
        assert I.sort_merge_join_count(j) == 1, plan
        # and it computes the right thing
        rows = {r["o_orderpriority"]: r["qty"] for r in j.collect()}
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders")
        want = {
            r["o_orderpriority"]: r["qty"]
            for r in li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
            .collect()
        }
        assert rows == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_same_join_shuffles_both_sides(spark):
    """Control: the identical join off raw parquet exchanges BOTH sides —
    the cost bucketing eliminates."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders")
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = I.plan_string(j, "simple")
        assert I.shuffle_count(plan) == 3, plan  # 2 join sides + final agg
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
