"""Table catalog: parquet loaders and temp-view registration.

Replaces the reference's "connect to TiDB and name tables in SQL strings"
pattern (``harvard_artifacts_app.py:315-352``) with Spark's catalog. Tables
are columnar parquet; scans get predicate pushdown + column pruning for free.

On a 100 TB deployment these would be partitioned/bucketed external tables
(see ``SCALE.md``); the loader API is path-based so the same code serves
local testdata and a production warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    """Scan one table. Parquet → vectorized reader, pushdown, pruning."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
