"""Bucketed-warehouse plan test: the co-located join must not shuffle."""

from __future__ import annotations

import pyspark.sql.functions as F

from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
    load_table,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl import (
    warehouse as W,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.plans.explain import (
    formatted_plan,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    W.build_bucketed_warehouse(spark, sf_dir, buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = W.bucketed_orders_lineitem_join(spark)
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"

        # and it computes the same thing as the plain join
        o = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        expected = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_reuses_partitioning(spark, sf_dir):
    """groupBy on the bucket key over a bucketed table needs no shuffle."""
    W.build_bucketed_warehouse(spark, sf_dir, buckets=4, tables=("lineitem",))
    li = spark.table("lineitem_bucketed")
    agg = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    assert "Exchange" not in formatted_plan(agg)
    assert agg.count() == li.select("l_orderkey").distinct().count()


def test_partitioned_events_prune_and_match(spark, sf_dir, tmp_path):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
        load_table,
    )
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl.warehouse import (
        write_events_partitioned,
    )

    out = str(tmp_path / "events_by_date")
    write_events_partitioned(spark, sf_dir, out)

    part = spark.read.parquet(out)
    # pick the first date present
    day = part.select(F.min("event_date").alias("d")).collect()[0]["d"]
    pruned = part.filter(F.col("event_date") == F.lit(day))

    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan

    # row count equals the unpartitioned date filter
    e = load_table(spark, sf_dir, "events")
    expect = e.filter(F.to_date("ts") == F.lit(day)).count()
    assert pruned.count() == expect > 0


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    import glob

    from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
        load_table,
    )
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl.warehouse import (
        compact_parquet,
    )

    frag = str(tmp_path / "fragmented")
    e = load_table(spark, sf_dir, "events")
    e.repartition(20).write.parquet(frag)
    assert len(glob.glob(f"{frag}/*.parquet")) == 20

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    assert spark.read.parquet(out).count() == e.count()


# --- MERGE upsert + SCD2 apply ---------------------------------------------------


def _read_fact(spark, path):
    rows = spark.read.parquet(path).collect()
    return {r["k"]: (r["part"], r["val"]) for r in rows}


def test_merge_upsert_three_batches_with_updates(spark, tmp_path):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl.warehouse import (
        merge_upsert_partitioned,
    )

    target = str(tmp_path / "fact")
    b1 = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (5, "c", 50)],
        "k long, part string, val long",
    )
    merge_upsert_partitioned(spark, target, b1, ("k",), "part")
    assert _read_fact(spark, target) == {
        1: ("a", 10), 2: ("a", 20), 3: ("b", 30), 5: ("c", 50)
    }

    # batch 2 UPDATES key 2 and inserts key 4 — not just inserts
    import os, glob

    c_files_before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(target, "part=c", "*.parquet"))
    }
    b2 = spark.createDataFrame(
        [(2, "a", 25), (4, "b", 40)], "k long, part string, val long"
    )
    merge_upsert_partitioned(spark, target, b2, ("k",), "part")
    assert _read_fact(spark, target) == {
        1: ("a", 10), 2: ("a", 25), 3: ("b", 30), 4: ("b", 40), 5: ("c", 50)
    }
    # untouched partition c was neither rewritten nor deleted
    c_files_after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(target, "part=c", "*.parquet"))
    }
    assert c_files_after == c_files_before

    # batch 3 = re-apply batch 2: idempotent
    merge_upsert_partitioned(spark, target, b2, ("k",), "part")
    assert _read_fact(spark, target) == {
        1: ("a", 10), 2: ("a", 25), 3: ("b", 30), 4: ("b", 40), 5: ("c", 50)
    }


def test_scd2_apply_closes_current_and_is_idempotent(spark):
    import datetime as dt

    from harvard_artifacts_collection_data_engineering_analytics_app_spark.etl.warehouse import (
        scd2_apply,
    )

    empty = spark.createDataFrame(
        [], "k long, valid_from date, valid_to date, status string, is_current int"
    )
    d = dt.date
    b1 = spark.createDataFrame(
        [(1, d(2024, 1, 1), "new"), (2, d(2024, 1, 2), "new")],
        "k long, valid_from date, status string",
    )
    h1 = scd2_apply(empty, b1, "k", ("status",))
    got1 = {(r["k"], r["valid_from"]): (r["valid_to"], r["status"], r["is_current"])
            for r in h1.collect()}
    assert got1 == {
        (1, d(2024, 1, 1)): (None, "new", 1),
        (2, d(2024, 1, 2)): (None, "new", 1),
    }

    # batch 2 changes key 1 → old row closes (valid_to, is_current=0)
    b2 = spark.createDataFrame(
        [(1, d(2024, 2, 1), "shipped")], "k long, valid_from date, status string"
    )
    h2 = scd2_apply(h1, b2, "k", ("status",))
    got2 = {(r["k"], r["valid_from"]): (r["valid_to"], r["status"], r["is_current"])
            for r in h2.collect()}
    assert got2 == {
        (1, d(2024, 1, 1)): (d(2024, 2, 1), "new", 0),
        (1, d(2024, 2, 1)): (None, "shipped", 1),
        (2, d(2024, 1, 2)): (None, "new", 1),
    }

    # re-applying the same batch is a no-op; a same-date correction wins
    h3 = scd2_apply(h2, b2, "k", ("status",))
    got3 = {(r["k"], r["valid_from"]): (r["valid_to"], r["status"], r["is_current"])
            for r in h3.collect()}
    assert got3 == got2
    fix = spark.createDataFrame(
        [(1, d(2024, 2, 1), "returned")], "k long, valid_from date, status string"
    )
    h4 = scd2_apply(h3, fix, "k", ("status",))
    got4 = {(r["k"], r["valid_from"]): (r["valid_to"], r["status"], r["is_current"])
            for r in h4.collect()}
    assert got4[(1, d(2024, 2, 1))] == (None, "returned", 1)


def test_zorder_layout_localizes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered layout vs single-key sort: a selective range filter on
    the SECONDARY dimension must touch strictly fewer files under z-order
    (single-sort clusters only its own key), while both layouts hold the
    same rows. This is the file-skipping property that pays at 100 TB."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_files = 16

    z_dir = str(tmp_path / "zorder")
    W.write_zordered(e, z_dir, cols=("user_id", "value"), n_files=n_files)
    s_dir = str(tmp_path / "sorted")
    (
        e.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(s_dir)
    )

    lo, hi = e.approxQuantile("value", [0.40, 0.45], 0.0)
    pred = (F.col("value") >= lo) & (F.col("value") < hi)

    def touched(path):
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_touched, s_touched = touched(z_dir), touched(s_dir)
    # same data either way
    assert (
        spark.read.parquet(z_dir).filter(pred).count()
        == spark.read.parquet(s_dir).filter(pred).count()
        == e.filter(pred).count()
    )
    # user_id-sorted layout scatters a value-range over ~every file;
    # z-order confines it
    assert z_touched < s_touched, (z_touched, s_touched)
    assert z_touched <= n_files // 2, f"z-order barely localized: {z_touched}"


def test_content_key_changes_when_source_regenerates(tmp_path):
    """Persisted-artifact staleness guard (r5 advice, generalized): the
    content fingerprint must change when the source parquet is
    regenerated under the SAME path — path-keyed names silently served
    stale indexes/MVs before."""
    import os
    import shutil

    from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
        content_key,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    dst_dir = tmp_path / "sf"
    dst_dir.mkdir()
    dst = dst_dir / "events.parquet"
    shutil.copyfile(src, dst)
    k1 = content_key(str(dst_dir), "events")
    assert k1 == content_key(str(dst_dir), "events"), "key not deterministic"
    os.utime(dst, ns=(1, 1))  # same bytes, regenerated mtime
    k2 = content_key(str(dst_dir), "events")
    assert k1 != k2, "regeneration under the same path must change the key"
    # a missing source (typo'd table / not-yet-generated data) must raise,
    # not silently fall back to a path-only hash (r6 advice)
    import pytest

    with pytest.raises(FileNotFoundError):
        content_key(str(dst_dir), "documents")


def test_gc_stale_artifacts_drops_superseded_keys(spark, tmp_path):
    """Every source regeneration mints a new content-keyed artifact name;
    the superseded siblings (same prefix, different 12-hex key) must be
    collected from both the catalog and the warehouse dir, or the
    warehouse grows one dead index per regeneration forever (r6 advice)."""
    import os
    from urllib.parse import urlparse

    from harvard_artifacts_collection_data_engineering_analytics_app_spark.catalog import (
        gc_stale_artifacts,
    )

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    # key layout: 4-hex sf_dir tag + 8-hex content hash. Only a sibling
    # with the SAME tag (same source dir, regenerated content) is
    # superseded; a different tag is another scale factor's still-valid
    # artifact and must survive (r7 advice — alternating-SF runs used to
    # thrash each other's persisted indexes).
    old, new = "gcdemo_idx_feedaaaaaaaa", "gcdemo_idx_feedbbbbbbbb"
    other_sf = "gcdemo_idx_beefcccccccc"
    # pre-migration pure-content key: its pseudo-"tag" matches no source
    # dir the new scheme ever minted, so it must be swept, not protected
    # as "another sf_dir's artifact" (r8 advice — permanent leak).
    legacy = "gcdemo_idx_0123456789ab"
    unrelated = "gcdemo_other_feeddddddddd"  # different prefix, same tag
    # the other scale factor's build ran gc at some point IN THE PAST,
    # registering its tag in the warehouse sidecar — that registration is
    # what protects its artifacts from the unknown-tag (legacy) sweep
    spark.sql(f"DROP TABLE IF EXISTS {other_sf}")
    spark.range(3).write.mode("overwrite").format("parquet").saveAsTable(
        other_sf
    )
    gc_stale_artifacts(spark, other_sf)
    for t in (old, new, legacy, unrelated):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.range(3).write.mode("overwrite").format("parquet").saveAsTable(t)
    dropped = gc_stale_artifacts(spark, new)
    assert dropped == [legacy, old]
    assert not spark.catalog.tableExists(old)
    assert not os.path.exists(os.path.join(warehouse, old))
    assert not spark.catalog.tableExists(legacy)
    # current key, other-sf_dir key, and different-prefix artifact survive
    assert spark.table(new).count() == 3
    assert spark.table(other_sf).count() == 3
    assert spark.table(unrelated).count() == 3
    for t in (new, other_sf, unrelated):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
