"""Hypertable-style multi-granularity time rollup (continuous aggregates).

Timescale-style hypertables serve the same aggregate at several time
grains (hour/day/month). The naive Spark form — ``GROUPING SETS`` over
derived bucket columns — Expands every input row once per grain *before*
the shuffle, so a 3-grain rollup shuffles 3x the raw table.

The scale-correct formulation is hierarchical: aggregate the raw table to
the finest grain once (one scan, one shuffle, map-side partial agg), then
re-aggregate that already-tiny result upward — each coarser grain costs a
shuffle of |distinct finest buckets| rows, which at 100 TB is the
difference between re-shuffling the fact table per grain and re-shuffling
a few thousand rows. Requires the aggregates to be decomposable
(count/sum/min/max re-aggregate exactly; avg is carried as sum+count).

The reference app has no time-series operator (events are this repo's
extension surface); sums follow the cents-integer convention so the
DuckDB oracle hash-matches exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..queries.registry import register
from ..session import ensure_analytics_conf

# finest → coarsest; each level re-aggregates the previous one.
GRAINS = ("hour", "day", "month")


def hierarchical_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: tuple[str, ...],
    value_col: str,
    grains: tuple[str, ...] = GRAINS,
) -> DataFrame:
    """count/sum of ``value_col`` per (grain, bucket_ts, *key_cols) for every
    grain, computed as a cascade: raw → grains[0] → grains[1] → ...

    Returns columns: grain, bucket_ts, *key_cols, cnt, sum_value. The sum is
    accumulated in integer cents internally so re-aggregation is exact and
    partition-order independent.
    """
    finest = df.groupBy(
        F.date_trunc(grains[0], F.col(ts_col)).alias("bucket_ts"), *key_cols
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.round(F.col(value_col) * F.lit(100)).cast("bigint")).alias("_cents"),
    )

    levels = [finest.withColumn("grain", F.lit(grains[0]))]
    prev = finest
    for g in grains[1:]:
        prev = prev.groupBy(
            F.date_trunc(g, F.col("bucket_ts")).alias("bucket_ts"), *key_cols
        ).agg(F.sum("cnt").alias("cnt"), F.sum("_cents").alias("_cents"))
        levels.append(prev.withColumn("grain", F.lit(g)))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out.select(
        "grain",
        "bucket_ts",
        *key_cols,
        "cnt",
        (F.col("_cents") / F.lit(100.0)).alias("sum_value"),
    )


@register(
    "ht_rollup_multigrain",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS bucket_ts,
               event_type,
               COUNT(*) AS cnt,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events
        GROUP BY bucket_ts, event_type
    )
    SELECT 'hour' AS grain, bucket_ts, event_type, cnt, cents / 100.0 AS sum_value
    FROM hourly
    UNION ALL
    SELECT 'day', date_trunc('day', bucket_ts), event_type,
           CAST(SUM(cnt) AS BIGINT), CAST(SUM(cents) AS BIGINT) / 100.0
    FROM hourly GROUP BY 2, 3
    UNION ALL
    SELECT 'month', date_trunc('month', bucket_ts), event_type,
           CAST(SUM(cnt) AS BIGINT), CAST(SUM(cents) AS BIGINT) / 100.0
    FROM hourly GROUP BY 2, 3
    """,
    tags=("rollup", "timeseries", "hypertable"),
)
def ht_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour/day/month continuous aggregate over events via the hierarchical
    cascade (raw shuffled once; coarser grains re-aggregate the hourly
    result). The oracle re-aggregates the same hourly CTE, proving the
    cascade is exact."""
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    return hierarchical_rollup(e, "ts", ("event_type",), "value")
