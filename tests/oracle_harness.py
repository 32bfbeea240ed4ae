"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares: row count, column names, and values (columns sorted
by name, rows sorted by all columns, floats compared with tolerance).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
    TABLES,
)

FLOAT_RTOL = 1e-6
FLOAT_ATOL = 1e-9


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written directory-style parquet
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    sort_cols = [c for c in df.columns]
    try:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    except TypeError:
        df = df.sort_values(sort_cols, key=lambda s: s.astype(str)).reset_index(
            drop=True
        )
    return df


def compare(spark_df, oracle_df) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    errs: list[str] = []
    if len(spark_df) != len(oracle_df):
        errs.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        errs.append(
            f"columns: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
    if errs:
        return errs
    a, b = _normalize(spark_df), _normalize(oracle_df)
    for c in a.columns:
        # Defensive: require exact pandas-dtype equality so a strict
        # driver-side schema check cannot flag e.g. int32 vs int64.
        da, db = a[c].dtype, b[c].dtype
        if str(da) != str(db) and not (da == object or db == object):
            errs.append(f"dtype col {c}: spark={da} oracle={db}")
    if errs:
        return errs
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(af, bf)):
                both_nan = math.isnan(x) and math.isnan(y)
                if not both_nan and not math.isclose(
                    x, y, rel_tol=FLOAT_RTOL, abs_tol=FLOAT_ATOL
                ):
                    errs.append(f"col {c} row {i}: spark={x!r} oracle={y!r}")
                    break
        else:
            neq = av.astype(str) != bv.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                errs.append(f"col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}")
    return errs


def run_case(spark, sf_dir: str, name: str, builder, oracle: str) -> list[str]:
    spark_pdf = builder(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).fetch_df()
    finally:
        con.close()
    return compare(spark_pdf, oracle_pdf)
