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


def test_partitioned_events_prune_and_match(spark, sf_dir, tmp_path):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
        load_table,
    )
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl.warehouse import (
        write_events_partitioned,
    )

    out = str(tmp_path / "events_by_date")
    write_events_partitioned(spark, sf_dir, out)

    part = spark.read.parquet(out)
    # pick the first date present
    day = part.select(F.min("event_date").alias("d")).collect()[0]["d"]
    pruned = part.filter(F.col("event_date") == F.lit(day))

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan

    # row count equals the unpartitioned date filter
    e = load_table(spark, sf_dir, "events")
    expect = e.filter(F.to_date("ts") == F.lit(day)).count()
    assert pruned.count() == expect > 0


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    import glob

    from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
        load_table,
    )
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl.warehouse import (
        compact_parquet,
    )

    frag = str(tmp_path / "fragmented")
    e = load_table(spark, sf_dir, "events")
    e.repartition(20).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 20

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == e.count()
