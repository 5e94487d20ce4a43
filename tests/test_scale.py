"""Scale utilities: salted aggregation/join equivalence + bucketed
co-located joins (shuffle-free plan verification)."""

from __future__ import annotations

from pyspark.sql import functions as F

from orientdb_spark.scale import (
    bucketed_join_plan_is_shuffle_free,
    salted_aggregate,
    salted_join,
    write_bucketed,
)

from tests.conftest import SF_DIR


def test_salted_aggregate_matches_direct(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    direct = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("q"), F.count("l_orderkey").alias("n")
    )
    salted = salted_aggregate(
        li, ["l_returnflag"], {"q": ("l_quantity", "sum"), "n": ("l_orderkey", "count")}
    )
    assert direct.exceptAll(salted).count() == 0
    assert salted.exceptAll(direct).count() == 0


def test_salted_join_matches_direct(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey", "o_custkey")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    direct = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "o_custkey").select("o_orderkey", "c_name")
    assert direct.exceptAll(salted).count() == 0
    assert salted.exceptAll(direct).count() == 0


def test_bucketed_join_is_shuffle_free(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    write_bucketed(orders, "orders_b", "o_custkey", n_buckets=8)
    write_bucketed(cust, "cust_b", "o_custkey", n_buckets=8)
    assert bucketed_join_plan_is_shuffle_free(spark, "orders_b", "cust_b", "o_custkey")
    # and the co-located join returns the same rows as the plain one
    a = spark.table("orders_b").join(spark.table("cust_b"), "o_custkey").count()
    b = orders.join(cust, "o_custkey").count()
    assert a == b


def test_key_partitioned_point_lookup_prunes(spark):
    import tempfile

    from orientdb_spark.scale import key_point_lookup, write_key_partitioned

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = tempfile.mkdtemp(prefix="ospark_part_") + "/orders_part"
    write_key_partitioned(orders, path, "o_orderkey", n_partitions=16)
    hit = key_point_lookup(spark, path, "o_orderkey", 42, n_partitions=16)
    assert hit.count() == 1
    plan = hit._jdf.queryExecution().executedPlan().toString()
    # the partition filter reached the scan: only the matching __kp
    # directory is read
    assert "PartitionFilters: [" in plan and "__kp" in plan.split("PartitionFilters")[1][:120]
