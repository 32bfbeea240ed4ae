"""Bucketed warehouse: co-located fact⋈fact joins with zero shuffle.

The reference's MySQL tables rely on B-tree PK lookups; the Spark-native
equivalent for repeated large joins is **bucketing**: write both fact
tables hash-bucketed (and sorted) by the join key, and Catalyst plans a
bucket-local sort-merge join with no Exchange on either side.

At 100 TB this converts every orderkey join from a full shuffle of the
fact tables into partition-local merges — size buckets to 100–500 MB
each at production scale (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

# table → (bucket/sort key, bucketed table name)
BUCKET_SPECS: dict[str, tuple[str, str]] = {
    "orders": ("o_orderkey", "orders_bucketed"),
    "lineitem": ("l_orderkey", "lineitem_bucketed"),
    "customer": ("c_custkey", "customer_bucketed"),
}


def build_bucketed_warehouse(
    spark: SparkSession,
    sf_dir: str,
    buckets: int = 8,
    tables: tuple[str, ...] = ("orders", "lineitem"),
) -> dict[str, str]:
    """Write bucketed+sorted copies of ``tables`` into the session catalog.

    Returns {source_table: bucketed_table_name}.
    """
    out: dict[str, str] = {}
    for name in tables:
        key, bucketed_name = BUCKET_SPECS[name]
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(bucketed_name)
        )
        out[name] = bucketed_name
    return out


def bucketed_orders_lineitem_join(spark: SparkSession) -> DataFrame:
    """The canonical co-located join over the bucketed warehouse tables."""
    o = spark.table(BUCKET_SPECS["orders"][1])
    li = spark.table(BUCKET_SPECS["lineitem"][1])
    return o.join(li, o.o_orderkey == li.l_orderkey)
