"""Range (interval) join: match fact rows to the interval containing them.

The reference app has no interval operator (its 20 templates are pure
equi-joins, ``harvard_artifacts_app.py:289-313``); this is part of the
extension surface a large-scale pipeline needs (price banding, time-range
enrichment, SLA windows).

Spark has no native range-join rewrite (Databricks' range-join hint is
proprietary), so two strategies are provided:

- **broadcast** — a broadcast non-equi join (``BroadcastNestedLoopJoin``).
  Right for the common case of a small interval dimension: every fact
  partition scans the handful of intervals in memory, no shuffle at all.
- **bucketed** — the scale path when the interval table is itself large
  (thousands+ of intervals): explode each interval into the fixed-width
  buckets it overlaps, equi-join fact rows on ``floor(value / width)``,
  then refine with the exact range predicate. This turns an O(n·m)
  nested-loop into a shuffled equi-join whose cost is O(n + m·spread) —
  at 100 TB it is the difference between a broadcast loop over every row
  and an ordinary hash join Catalyst/AQE can plan like any other.

Both produce identical results; the driver oracle-checks each against the
same DuckDB range-join SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..queries.registry import register
from ..session import ensure_analytics_conf


def range_join_broadcast(
    fact: DataFrame,
    value_col: str,
    intervals: DataFrame,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Inner-join fact rows to intervals with ``lo <= value < hi``.

    Broadcasts the interval side; use only when it fits in memory.
    """
    v = F.col(value_col)
    return fact.join(
        F.broadcast(intervals), (v >= F.col(lo)) & (v < F.col(hi))
    )


def range_join_bucketed(
    fact: DataFrame,
    value_col: str,
    intervals: DataFrame,
    bucket_width: float,
    lo: str = "lo",
    hi: str = "hi",
) -> DataFrame:
    """Inner-join fact rows to intervals with ``lo <= value < hi`` as an
    equi-join on fixed-width buckets plus an exact refinement predicate.

    Each interval is exploded into every bucket of ``bucket_width`` it
    overlaps (``sequence(floor(lo/w), floor((hi-ulp)/w))``); fact rows
    carry their single bucket. The join becomes a plain shuffled equi-join
    on ``_bucket`` — broadcastable, AQE-skew-splittable, bucket-layout
    co-locatable — instead of a nested loop. Choose ``bucket_width`` near
    the median interval width so the explode factor stays ~1-2x.
    """
    w = F.lit(bucket_width)
    exploded = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / w),
                # hi is exclusive: an interval ending exactly on a bucket
                # boundary does not overlap that bucket.
                F.floor((F.col(hi) - F.lit(1e-9)) / w),
            )
        ),
    )
    v = F.col(value_col)
    tagged = fact.withColumn("_bucket", F.floor(v / w))
    return (
        tagged.join(exploded, "_bucket")
        .filter((v >= F.col(lo)) & (v < F.col(hi)))
        .drop("_bucket")
    )


# --- driver-visible queries: order-value tiers --------------------------------------

# Irregular boundaries on purpose — a width_bucket() could not express them,
# so the oracle genuinely exercises the range predicate.
PRICE_TIERS = (
    ("micro", 0.0, 5_000.0),
    ("small", 5_000.0, 50_000.0),
    ("medium", 50_000.0, 150_000.0),
    ("large", 150_000.0, 350_000.0),
    ("jumbo", 350_000.0, 600_000.0),
)

_TIER_ORACLE = f"""
    WITH tiers(tier, lo, hi) AS (
        VALUES {", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in PRICE_TIERS)}
    )
    SELECT tier,
           COUNT(*) AS cnt,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price
    FROM orders
    JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY tier
"""


def _tiers_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(PRICE_TIERS), "tier string, lo double, hi double")


def _tier_agg(joined: DataFrame) -> DataFrame:
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("cnt"),
        (
            F.sum(F.round(F.col("o_totalprice") * F.lit(100)).cast("bigint"))
            / F.lit(100.0)
        ).alias("sum_price"),
    )


@register(
    "rj_price_tier_broadcast",
    oracle=_TIER_ORACLE,
    tags=("rangejoin", "broadcast", "agg"),
)
def rj_price_tier_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join orders→price tiers via broadcast non-equi join, then
    per-tier count/sum."""
    ensure_analytics_conf(spark)
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    return _tier_agg(range_join_broadcast(o, "o_totalprice", _tiers_df(spark)))


@register(
    "rj_price_tier_bucketed",
    oracle=_TIER_ORACLE,
    tags=("rangejoin", "equi-rewrite", "agg"),
)
def rj_price_tier_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same tier aggregate through the bucketed equi-join rewrite (the
    large-interval-table scale path); identical oracle as the broadcast
    variant proves the rewrite is lossless."""
    ensure_analytics_conf(spark)
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    return _tier_agg(
        range_join_bucketed(o, "o_totalprice", _tiers_df(spark), bucket_width=25_000.0)
    )
