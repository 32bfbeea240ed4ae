"""Unit test for the LTTB triangle-area selector (round-6 advice, MEDIUM).

The division-cleared area had a flipped sign in its second term, computing
|T1+T2| instead of |T1-T2| — which could score a candidate COLLINEAR with
its anchors (true area 0) above a far off-line one. The DuckDB oracle
shared the identical formula, so the parity gate could not see it; this
test pins the geometry directly with a hand-built series.
"""

from __future__ import annotations

import datetime as dt

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.rollup import (
    ht_lttb_downsample,
)


def _write_events(spark, sf_dir: str, hourly_counts: dict[int, int]) -> None:
    """Write an events table with exactly ``count`` events in hour ``h``
    (hours offset from 2024-01-01T00:00Z, a bucket-aligned day boundary)."""
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    eid = 0
    for h, cnt in hourly_counts.items():
        for i in range(cnt):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(hours=h, minutes=i % 60),
                    int(eid),
                    "X",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")


def test_lttb_prefers_offline_point_over_collinear(spark, tmp_path):
    # Anchors: bucket 0 mean = (H+0, 4), bucket 2 mean = (H+48, 12); the
    # P→N line passes exactly through (H+24, 8). Bucket 1 offers that
    # collinear point (true area 0) and an off-line point (H+30, 1) far
    # from the line. Correct LTTB must select the off-line point; the
    # pre-fix flipped formula scored collinear 384 vs off-line 96 and
    # picked the least-representative point.
    sf = str(tmp_path)
    _write_events(spark, sf, {0: 4, 24: 8, 30: 1, 48: 12})
    out = {
        r["bucket"]: (r["hr_idx"], r["cnt"], r["anchored"])
        for r in ht_lttb_downsample(spark, sf).collect()
    }
    h0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() // 3600)
    b0 = h0 // 24
    assert out[b0] == (h0, 4, False)  # edge bucket keeps max-count point
    assert out[b0 + 2] == (h0 + 48, 12, False)
    # the anchored middle bucket must pick the off-line candidate
    assert out[b0 + 1] == (h0 + 30, 1, True)
