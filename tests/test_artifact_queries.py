"""Run all 20 reference query templates on artifact-shaped tables, on both
Spark and DuckDB (FIXTURES.md §A / SURVEY.md §2.2).

Deterministic queries compare full values; bare-LIMIT and tie-prone top-k
templates compare row counts (the driver-gated rq* queries in
queries/reference_parity.py lock those shapes value-wise on unique keys).
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
    artifact_templates as AT,
)

from .oracle_harness import compare

ROWCOUNT_ONLY = AT.NONDETERMINISTIC_LIMIT

CULTURES = ["Byzantine", "Greek", "Roman", "Egyptian", ""]
CENTURIES = ["11th century", "12th century", "5th century BCE", ""]
PERIODS = ["Archaic", "Early Archaic period", "Classical", "", None]
DEPTS = ["Coins", "Paintings", "Sculpture"]
CLASSES = ["Coins", "Paintings", "Sculpture", "Jewelry", "Drawings"]
HUES = ["Grey", "Red", "Blue", "Green", None]
COLORS = ["#111111", "#222222", "#333333", "#444444"]


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    rng = random.Random(42)
    n = 400
    meta, media, colors = [], [], []
    for i in range(n):
        meta.append(
            {
                "id": i,
                "title": f"Artifact {i:04d}",
                "culture": rng.choice(CULTURES),
                "period": rng.choice(PERIODS),
                "century": rng.choice(CENTURIES),
                "medium": "bronze",
                "dimensions": "10x10",
                "description": "d" * rng.randint(0, 500),
                "department": rng.choice(DEPTS),
                "classification": rng.choice(CLASSES),
                "accessionyear": rng.choice([None, 1900 + rng.randint(0, 120)]),
                "accessionmethod": "Gift",
            }
        )
        media.append(
            {
                "objectid": i,
                "imagecount": rng.randint(0, 5),
                "mediacount": rng.randint(0, 3),
                "colorcount": rng.randint(0, 6),
                "rank": rng.choice([None, rng.randint(0, 50)]),
                "datebegin": rng.choice([None, rng.randint(1400, 1700)]),
                "dateend": rng.choice([None, rng.randint(1700, 1900)]),
            }
        )
        for _ in range(rng.randint(0, 5)):
            colors.append(
                {
                    "objectid": i,
                    "spectrum": "#aaa",
                    "hue": rng.choice(HUES),
                    "color": rng.choice(COLORS),
                    "percent": rng.random(),
                    "css3": "#bbb",
                }
            )
    d = tmp_path_factory.mktemp("artifact_tables")
    pd.DataFrame(meta).astype({"accessionyear": "Int32"}).to_parquet(
        d / "artifactmetadata.parquet"
    )
    pd.DataFrame(media).astype(
        {"rank": "Int32", "datebegin": "Int32", "dateend": "Int32"}
    ).to_parquet(d / "artifactmedia.parquet")
    pd.DataFrame(colors).to_parquet(d / "artifactcolors.parquet")
    return d


TABLES = ("artifactmetadata", "artifactmedia", "artifactcolors")


@pytest.fixture(scope="module")
def engines(spark, artifact_dir):
    for t in TABLES:
        spark.read.parquet(str(artifact_dir / f"{t}.parquet")).createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{artifact_dir}/{t}.parquet')"
        )
    yield spark, con
    con.close()


@pytest.mark.parametrize("name", sorted(AT.QUERY_TEMPLATES, key=lambda s: int(s[1:])))
def test_reference_template(engines, name):
    spark, con = engines
    spdf = spark.sql(AT.spark_sql(name)).toPandas()
    ddf = con.execute(AT.duckdb_sql(name)).fetch_df()
    if name in ROWCOUNT_ONLY:
        assert len(spdf) == len(ddf), f"{name}: {len(spdf)} vs {len(ddf)}"
    else:
        errs = compare(spdf, ddf)
        # AVG(int) dtype: MySQL DECIMAL vs Spark/DuckDB DOUBLE is a known,
        # documented divergence (SURVEY.md §4) — both engines here agree.
        assert not errs, f"{name}: " + "; ".join(errs)
