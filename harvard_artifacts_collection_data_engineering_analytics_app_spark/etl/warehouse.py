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


def write_events_partitioned(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> str:
    """Write events date-partitioned (`event_date=.../part-*.parquet`).

    The layout for append-only event logs at scale: partition pruning
    turns a date-ranged query into a scan of only the matching
    directories, and each day's data clusters into its own files.
    ``repartition`` on the partition column before the write gives one
    task (→ one file) per date instead of every task writing a sliver of
    every date — the classic small-files trap at high parallelism.
    """
    import pyspark.sql.functions as F

    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    (
        e.repartition("event_date")
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return out_dir


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a small-file-fragmented parquet directory into
    ceil(total_bytes / target) files. Returns the output file count.

    Maintenance compaction for streaming sinks (each micro-batch writes a
    file per task). Sizing uses the source footprint on the driver-local
    filesystem; on HDFS/S3 swap the size probe for a FileSystem listing —
    the Spark plan (scan → round-robin repartition → write) is unchanged.
    """
    import math
    import os

    total = 0
    for root, _, files in os.walk(in_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(in_dir).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_dir)
    return n_files
