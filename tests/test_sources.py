"""Tests for the REST ingest source (serial + distributed paths)."""

from __future__ import annotations

from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl import (
    artifacts as A,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources import (
    rest,
)


def test_serial_pagination_stops_at_target():
    fetch = rest.synthetic_fetcher(total_records=1000)
    records = rest.fetch_serial(fetch, target_records=250)
    assert len(records) == 250
    assert records[0]["id"] == 0 and records[249]["id"] == 249


def test_serial_pagination_stops_on_short_page():
    fetch = rest.synthetic_fetcher(total_records=130)
    records = rest.fetch_serial(fetch, target_records=2500)
    assert len(records) == 130  # short page 2 terminates the loop


def test_ingest_serial_schema(spark):
    df = rest.ingest_serial(spark, rest.synthetic_fetcher(300), target_records=300)
    assert df.count() == 300
    assert df.schema["colors"].dataType.typeName() == "array"


def test_ingest_distributed_matches_serial(spark):
    fetch = rest.synthetic_fetcher(total_records=450)
    serial = rest.ingest_serial(spark, fetch, target_records=450)
    dist = rest.ingest_distributed(spark, fetch, n_pages=5, tasks=3)
    assert dist.count() == 450
    assert sorted(r["id"] for r in dist.select("id").collect()) == sorted(
        r["id"] for r in serial.select("id").collect()
    )


def test_ingest_feeds_etl(spark):
    df = rest.ingest_distributed(spark, rest.synthetic_fetcher(200), n_pages=2)
    out = A.transform_all(df)
    assert out["artifactmetadata"].count() == 200
    colors = out["artifactcolors"]
    assert colors.groupBy("objectid").count().agg({"count": "max"}).collect()[0][
        0
    ] <= 5
