"""Bucketed-warehouse plan test: the co-located join must not shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F

from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
    load_table,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl import (
    warehouse as W,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.plans.explain import (
    formatted_plan,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    W.build_bucketed_warehouse(spark, sf_dir, buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = W.bucketed_orders_lineitem_join(spark)
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"

        # and it computes the same thing as the plain join
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        expected = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_reuses_partitioning(spark, sf_dir):
    """groupBy on the bucket key over a bucketed table needs no shuffle."""
    W.build_bucketed_warehouse(spark, sf_dir, buckets=4, tables=("lineitem",))
    li = spark.table("lineitem_bucketed")
    agg = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    assert "Exchange" not in formatted_plan(agg)
    assert agg.count() == li.select("l_orderkey").distinct().count()
