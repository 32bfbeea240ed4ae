"""Tests for the REST ingest source (serial + distributed paths)."""

from __future__ import annotations

import pyspark.sql.functions as F

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


# --- file sources (CSV / NDJSON) -------------------------------------------------


def _file_schema():
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )


def test_read_csv_clean_and_corrupt(spark, tmp_path):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources import (
        files,
    )

    p = tmp_path / "drop.csv"
    p.write_text("id,name,score\n1,alpha,0.5\nnot_a_number,beta,oops\n3,gamma,2.0\n")
    df = files.read_csv(spark, str(p), _file_schema())
    clean, bad = files.split_corrupt(df)
    rows = {r["id"]: r for r in clean.collect()}
    assert set(rows) == {1, 3} and rows[3]["score"] == 2.0
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0][files.CORRUPT_COL]


def test_read_ndjson_clean_and_corrupt(spark, tmp_path):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources import (
        files,
    )

    p = tmp_path / "drop.jsonl"
    p.write_text(
        '{"id": 1, "name": "alpha", "score": 0.5}\n'
        "this is not json\n"
        '{"id": 2, "name": "beta", "score": 1.25}\n'
    )
    df = files.read_ndjson(spark, str(p), _file_schema())
    clean, bad = files.split_corrupt(df)
    assert {r["id"] for r in clean.collect()} == {1, 2}
    assert bad.count() == 1


def test_file_sources_feed_etl(spark, tmp_path):
    # CSV → clean split → the same NaN/inf sanitation used by the REST path
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources import (
        files,
    )

    p = tmp_path / "scores.csv"
    p.write_text("id,name,score\n1,a,Inf\n2,b,1.0\n")
    clean, _ = files.split_corrupt(files.read_csv(spark, str(p), _file_schema()))
    out = A.sanitize_floats(clean).collect()
    got = {r["id"]: r["score"] for r in out}
    assert got[1] is None and got[2] == 1.0


# --- HttpPageFetcher (fake transport, no network) --------------------------------


def _fake_api(total: int, page_size: int = 100):
    """Transport simulating the Harvard API's records/info.next shape."""
    calls: list[dict] = []

    def transport(url: str, params: dict) -> dict:
        calls.append({"url": url, **params})
        page = params["page"]
        start = (page - 1) * page_size
        recs = [{"id": i} for i in range(start, min(start + page_size, total))]
        info = {"next": "url"} if start + page_size < total else {}
        return {"records": recs, "info": info}

    return transport, calls


def test_http_fetcher_paginates_to_target():
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources.rest import (
        HttpPageFetcher,
        fetch_serial,
    )

    transport, calls = _fake_api(total=10_000)
    f = HttpPageFetcher("k", "Coins", transport=transport, sleep_fn=lambda s: None)
    got = fetch_serial(f, target_records=250)
    assert len(got) == 250
    assert [c["page"] for c in calls] == [1, 2, 3]
    assert calls[0]["classification"] == "Coins" and calls[0]["apikey"] == "k"


def test_http_fetcher_stops_without_info_next():
    """A full page whose info lacks `next` must end pagination (reference
    harvard_artifacts_app.py:136) without further network calls."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources.rest import (
        HttpPageFetcher,
        fetch_serial,
    )

    transport, calls = _fake_api(total=100)  # exactly one full page, no next
    f = HttpPageFetcher("k", "Coins", transport=transport, sleep_fn=lambda s: None)
    got = fetch_serial(f, target_records=2500)
    assert len(got) == 100
    assert len(calls) == 1  # page 2 short-circuits to [] with no request
    assert f(2) == []
    assert len(calls) == 1


def test_http_fetcher_rate_limits_between_requests():
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources.rest import (
        HttpPageFetcher,
        fetch_serial,
    )

    transport, _ = _fake_api(total=350)
    sleeps: list[float] = []
    f = HttpPageFetcher(
        "k", "Coins", transport=transport, sleep_fn=sleeps.append
    )
    fetch_serial(f, target_records=2500)
    # 4 pages -> 3 inter-request sleeps of 0.1s; none before the first
    assert sleeps == [0.1, 0.1, 0.1]


def test_http_fetcher_empty_records_stops():
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources.rest import (
        HttpPageFetcher,
        fetch_serial,
    )

    def transport(url, params):
        return {"records": [], "info": {}}

    f = HttpPageFetcher("k", "Coins", transport=transport, sleep_fn=lambda s: None)
    assert fetch_serial(f, target_records=100) == []


def test_orc_roundtrip_pushdown_and_pruning(spark, sf_dir, tmp_path):
    """ORC write → enforced-schema read must be lossless, and the
    vectorized ORC scan must push filters and prune columns exactly like
    the parquet path (it is the same landing contract, different codec)."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
        load_table,
    )
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.plans.explain import (
        formatted_plan,
    )
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.sources import (
        files as FS,
    )

    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    FS.write_orc(src, path)
    back = FS.read_orc(spark, path, src.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    q = back.filter(F.col("n_regionkey") == 1).select("n_name")
    plan = formatted_plan(q)
    assert "PushedFilters: [IsNotNull(n_regionkey), EqualTo(n_regionkey,1)]" in plan
    assert "n_comment" not in plan.split("ReadSchema")[1].splitlines()[0]
