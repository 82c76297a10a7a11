"""Bucketed tables: joins on the bucket key must not shuffle (the
co-located join strategy for repeated large-table joins at scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquery_cross_environment_etl_pipeline_spark.sources.registry import load_table

from .conftest import SF_SMOKE


@pytest.fixture()
def bucketed_tables(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucket_demo")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS bucket_demo.b_{name}")
        (
            load_table(spark, SF_SMOKE, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"bucket_demo.b_{name}")
        )
    yield
    spark.sql("DROP DATABASE IF EXISTS bucket_demo CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = spark.table("bucket_demo.b_orders")
        lineitem = spark.table("bucket_demo.b_lineitem")
        joined = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).select("l_orderkey", "o_totalprice", "l_quantity")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        # and it is still correct
        expected = (
            load_table(spark, SF_SMOKE, "lineitem")
            .join(
                load_table(spark, SF_SMOKE, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
