"""Table catalog: parquet loaders and temp-view registration.

Replaces the reference's "connect to TiDB and name tables in SQL strings"
pattern (``harvard_artifacts_app.py:315-352``) with Spark's catalog. Tables
are columnar parquet; scans get predicate pushdown + column pruning for free.

On a 100 TB deployment these would be partitioned/bucketed external tables
(see ``SCALE.md``); the loader API is path-based so the same code serves
local testdata and a production warehouse.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, TimestampNTZType

from .session import ensure_analytics_conf

# The driver-generated star schema + extension tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Parquet → vectorized reader, pushdown, pruning.

    ``events.parquet`` has shipped with two physical ``ts`` encodings across
    testdata generations; both normalize to TimestampType (instant) here so
    every downstream operator sees one type:

    - TIMESTAMP(NANOS): Spark's reader rejects it by default; read as int64
      nanoseconds and convert with integer division (a double division
      would lose precision on epoch-nanos). DuckDB truncates ns→µs the
      same way, so oracle semantics match.
    - TIMESTAMP_NTZ (isAdjustedToUTC=false): cast to TimestampType with the
      session timezone pinned to UTC first (``ensure_analytics_conf``), so
      naive wall time == UTC instant — bit-identical epoch micros to what
      DuckDB's ``epoch_us(ts)`` computes on the naive value, and functions
      like ``unix_micros`` that reject NTZ keep working.
    """
    ensure_analytics_conf(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """Register temp views so ``spark.sql`` can reference tables by name."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
