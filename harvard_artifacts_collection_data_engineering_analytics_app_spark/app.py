"""Headless app parity: the reference's three entry points as a CLI.

The reference is a Streamlit app with three buttons (SURVEY.md §3):
E1 "Collect Data" → E2 "Insert to SQL" → E3 "Execute Query". This module
reproduces that workflow end-to-end on Spark — a user of the reference
can run the same flow with:

    python -m harvard_artifacts_collection_data_engineering_analytics_app_spark.app \
        --workdir /tmp/artifacts --records 500 collect
    python -m ... --workdir /tmp/artifacts insert
    python -m ... --workdir /tmp/artifacts query q12
    python -m ... --workdir /tmp/artifacts query all

`collect` uses the synthetic fetcher by default (no network in this
container); pass a real fetcher programmatically via :func:`collect`.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession

from .etl import artifacts as A
from .queries import artifact_templates as AT
from .schemas import RAW_ARTIFACT
from .session import get_spark
from .sources import rest

ARTIFACT_TABLES = ("artifactmetadata", "artifactmedia", "artifactcolors")


def collect(
    spark: SparkSession,
    workdir: str,
    fetch_page: rest.PageFetcher,
    target_records: int = rest.DEFAULT_TARGET,
) -> DataFrame:
    """E1: paginated ingest → raw records parquet (replaces session_state)."""
    raw = rest.ingest_serial(spark, fetch_page, target_records)
    raw.write.mode("overwrite").parquet(f"{workdir}/raw")
    return raw


def insert(spark: SparkSession, workdir: str) -> dict[str, int]:
    """E2: transform (T1-T5) → columnar warehouse (replaces TiDB INSERT).

    Cross-batch INSERT IGNORE semantics: new rows are anti-joined against
    the existing table before append (etl.artifacts.dedup_primary_key).
    """
    raw = spark.read.schema(RAW_ARTIFACT).parquet(f"{workdir}/raw")
    tables = A.transform_all(raw)
    counts: dict[str, int] = {}
    for name, df in tables.items():
        path = f"{workdir}/{name}"
        key = "id" if name == "artifactmetadata" else "objectid"
        if os.path.exists(path) and name != "artifactcolors":
            existing = spark.read.parquet(path)
            df = A.dedup_primary_key(df, key, existing=existing)
            df.write.mode("append").parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()
    return counts


def register_views(spark: SparkSession, workdir: str) -> None:
    for name in ARTIFACT_TABLES:
        spark.read.parquet(f"{workdir}/{name}").createOrReplaceTempView(name)


def query(spark: SparkSession, workdir: str, name: str) -> DataFrame:
    """E3: run one of the reference's 20 templates on the warehouse."""
    register_views(spark, workdir)
    return spark.sql(AT.spark_sql(name))


def chart_spec(
    df: DataFrame, max_bars: int = 20, width: int = 40
) -> list[dict]:
    """T-chart: headless equivalent of the reference's auto bar chart
    (harvard_artifacts_app.py:433-439 renders st.bar_chart of the first
    two result columns when the second is numeric).

    Returns [{label, value, bar}] with bar lengths normalized to the max
    |value| in the charted window — deterministic, terminal-renderable,
    and empty (never an error) when the result has no chartable shape,
    matching the reference's silent skip.
    """
    cols = df.columns
    if len(cols) < 2:
        return []
    rows = df.select(cols[0], cols[1]).limit(max_bars).collect()
    vals = [
        r[1]
        for r in rows
        if r[1] is not None and isinstance(r[1], (int, float)) and r[1] == r[1]
    ]
    if not vals:
        return []
    mx = max(abs(v) for v in vals) or 1
    return [
        {
            "label": str(r[0]),
            "value": r[1],
            "bar": (
                "#" * round(abs(r[1]) / mx * width)
                if isinstance(r[1], (int, float)) and r[1] is not None and r[1] == r[1]
                else ""
            ),
        }
        for r in rows
    ]


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--records", type=int, default=500)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("collect")
    sub.add_parser("insert")
    qp = sub.add_parser("query")
    qp.add_argument("name", help="q1..q20 or 'all'")
    qp.add_argument(
        "--chart",
        action="store_true",
        help="also emit the reference-style bar chart of the first two columns",
    )
    args = p.parse_args(argv)

    spark = get_spark(app_name="harvard-artifacts-app")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "collect":
        raw = collect(
            spark, args.workdir, rest.synthetic_fetcher(args.records), args.records
        )
        print(json.dumps({"collected": raw.count()}))
    elif args.cmd == "insert":
        print(json.dumps({"inserted": insert(spark, args.workdir)}))
    elif args.cmd == "query":
        names = sorted(AT.QUERY_TEMPLATES, key=lambda s: int(s[1:])) \
            if args.name == "all" else [args.name]
        for name in names:
            df = query(spark, args.workdir, name)
            rows = df.limit(10).collect()
            out = {
                "query": name,
                "sql": AT.spark_sql(name),
                "rows": [r.asDict() for r in rows],
            }
            if args.chart:
                out["chart"] = chart_spec(df)
            print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
