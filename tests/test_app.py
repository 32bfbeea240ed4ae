"""End-to-end app parity: collect → insert (idempotent) → query."""

from __future__ import annotations

from harvard_artifacts_collection_data_engineering_analytics_app_spark import app
from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources import (
    rest,
)


def test_collect_insert_query_roundtrip(spark, tmp_path):
    wd = str(tmp_path / "wd")
    raw = app.collect(spark, wd, rest.synthetic_fetcher(300), target_records=300)
    assert raw.count() == 300

    counts = app.insert(spark, wd)
    assert counts["artifactmetadata"] == 300
    assert counts["artifactmedia"] == 300
    assert counts["artifactcolors"] > 0

    # E3: every reference template runs on the built warehouse
    for name in ("q2", "q5", "q12", "q15", "q19", "q20"):
        df = app.query(spark, wd, name)
        assert df.count() >= 0


def test_insert_is_idempotent_like_insert_ignore(spark, tmp_path):
    """Re-inserting the same batch must not grow the PK tables
    (INSERT IGNORE semantics, harvard_artifacts_app.py:241)."""
    wd = str(tmp_path / "wd2")
    app.collect(spark, wd, rest.synthetic_fetcher(200), target_records=200)
    first = app.insert(spark, wd)
    second = app.insert(spark, wd)
    assert first == second
