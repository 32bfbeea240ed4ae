"""SparkSession factory.

The reference keeps a single memoized DB connection
(``harvard_artifacts_app.py:19-33``); our equivalent is a singleton
SparkSession tuned for columnar analytics:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- shuffle partitions sized to the machine (local[...]) — on a real cluster
  AQE coalescing makes the initial number a ceiling, not a constant cost
- UTC session timezone so timestamp semantics match the DuckDB oracle
- Arrow-backed pandas interchange for the few Pandas-UDF operators

At 100 TB these configs change per-cluster; everything here is a default,
not a hard-coded assumption.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "harvard-artifacts-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with analytics-friendly defaults."""
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{DEFAULT_CPUS}]")
        # local mode = the driver JVM IS the cluster: Spark's 1g default
        # heap GC-thrashes to death under 32 concurrent Arrow tasks at
        # sf>=1 (measured: JVM killed mid-bench). Size it to the machine;
        # on a real cluster this would be executor memory instead.
        # Only effective at JVM launch — a no-op on an existing session.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_CPUS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_analytics_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable confs to a session we did not create.

    The driver hands ``entry(spark)`` / ``queries()`` callables an arbitrary
    session; timezone and AQE are runtime-settable, so pin the ones that
    affect result correctness (timezone) or plan quality (AQE).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    return spark
