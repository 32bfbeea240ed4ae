"""File sources beyond parquet: CSV and NDJSON with schema enforcement.

The reference ingests only via REST + a SQL sink (``harvard_artifacts_app.py``
:105-152, :212-278); a production pipeline also lands CSV/JSONL drops. These
readers are thin, deliberately-configured wrappers over Spark's built-in
sources — the configuration IS the operator:

- **explicit schema always** (no ``inferSchema``): at 100 TB inference is a
  full extra pass over the data, and drifting inferred types silently
  corrupt downstream joins.
- **PERMISSIVE + ``_corrupt`` capture**: bad rows land in a quarantine
  column instead of killing the job (or being dropped unseen); callers
  split good/bad with :func:`split_corrupt` and route the bad rows to a
  dead-letter sink.
- both sources are splittable as configured (uncompressed CSV/NDJSON split
  by byte range; ``multiLine`` stays off — a multiline JSON file is one
  task, which at scale is a straggler by construction).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt"


def _with_corrupt_field(schema: StructType) -> StructType:
    return StructType(list(schema.fields)).add(CORRUPT_COL, StringType())


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV scan with enforced schema and malformed-row quarantine."""
    reader = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_ndjson(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Newline-delimited JSON scan with enforced schema and quarantine.

    ``multiLine`` stays False so files split by byte range across tasks.
    """
    return (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC scan with enforced schema — the other columnar landing format
    (Hive-ecosystem drops arrive as ORC as often as parquet). Spark's
    native vectorized ORC reader gives the same pushdown/pruning as
    parquet; schema is still explicit (a mismatched file fails loudly at
    read, not at the first bad join). ORC is self-describing, so there is
    no PERMISSIVE corrupt-row capture — structural corruption surfaces as
    a read error, which is the correct failure mode for a binary format.
    """
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str) -> str:
    """ORC sink (snappy, Spark default) — interop with Hive-side readers."""
    df.write.mode("overwrite").orc(path)
    return path


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, corrupt_rows) — route the second
    to a dead-letter sink; never drop it silently.

    Spark disallows plans that reference only the internal corrupt-record
    column of a raw CSV/JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    the scan is persisted before splitting — the intended usage is exactly
    one pass that writes both halves, so the persist is read twice and
    evicted, never a second scan of the raw files.
    """
    df = df.persist()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
