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

    qs, osql = e.queries(), e.oracle_sql()
    failures = []
    for name in sorted(qs):
        pdf = qs[name](spark, sf).toPandas()
        if name not in osql:
            print(f"  rows-only {name}: {len(pdf)} rows")
            continue
        con = duckdb_connection(sf)
        try:
            odf = con.execute(osql[name]).fetch_df()
        finally:
            con.close()
        errs = compare(pdf, odf)
        print(f"  {'OK  ' if not errs else 'FAIL'} {name}: {len(pdf)} rows")
        if errs:
            failures.append((name, errs))
    print(f"t2: {len(qs)} queries, {len(osql)} oracles, {len(failures)} failures")
    for name, errs in failures:
        print(f"FAIL {name}: {errs}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
