#!/usr/bin/env python
"""Simulate the driver's verify gate locally (t1 smoke + t2 oracle).

Creates a VANILLA SparkSession with a deliberately hostile timezone (the
driver controls the session, not us), runs entry(), then every queries()
entry at sf0.01 against its oracle_sql() via DuckDB.

    python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from oracle_harness import compare, duckdb_connection

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "t1 smoke: entry() returned no rows"
    print(f"t1 smoke OK ({len(rows)} rows)")

    import time

    qs, osql = e.queries(), e.oracle_sql()
    failures = []
    timings: dict[str, float] = {}
    for name in sorted(qs):
        # per-query elapsed on every line (judge VERDICT r7 #6): under CPU
        # contention a 10-minute query is otherwise indistinguishable from
        # a hang, because nothing prints until the query returns
        t0 = time.perf_counter()
        pdf = qs[name](spark, sf).toPandas()
        if name not in osql:
            timings[name] = time.perf_counter() - t0
            print(
                f"  rows-only {name}: {len(pdf)} rows"
                f"  [{timings[name]:.1f}s]",
                flush=True,
            )
            continue
        con = duckdb_connection(sf)
        try:
            odf = con.execute(osql[name]).fetch_df()
        finally:
            con.close()
        errs = compare(pdf, odf)
        timings[name] = time.perf_counter() - t0
        print(
            f"  {'OK  ' if not errs else 'FAIL'} {name}: {len(pdf)} rows"
            f"  [{timings[name]:.1f}s]",
            flush=True,
        )
        if errs:
            failures.append((name, errs))
    print(f"t2: {len(qs)} queries, {len(osql)} oracles, {len(failures)} failures")
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    print("slowest 10 (spark+oracle+compare, shared-session):")
    for name, t in slow:
        print(f"  {t:7.1f}s  {name}")
    for name, errs in failures:
        print(f"FAIL {name}: {errs}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
