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


# --- interval × interval overlap join -----------------------------------------------

OVERLAP_USERS_LT = 20  # session side bound (mirrors tw_session_30m)


@register(
    "rj_interval_overlap",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE user_id < 20
    ),
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN prev_ts IS NULL
                         OR ts >= prev_ts + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sess AS (
        SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM (
            SELECT user_id, ts,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            FROM flagged
        )
        GROUP BY user_id, sid
    ),
    hourly AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(*) AS cnt
        FROM events WHERE event_type = 'error'
        GROUP BY date_trunc('hour', ts)
    ),
    stats AS (SELECT SUM(cnt) AS total, COUNT(*) AS nh FROM hourly),
    busy AS (
        SELECT h, epoch_us(h) // 3600000000 AS hb
        FROM hourly, stats WHERE 2 * cnt * nh >= 3 * total
    ),
    runs AS (
        SELECT MIN(h) AS e_start, MAX(h) + INTERVAL '1 hour' AS e_end
        FROM (
            SELECT h, hb - ROW_NUMBER() OVER (ORDER BY hb) AS grp FROM busy
        )
        GROUP BY grp
    )
    SELECT s.user_id, s.s_start, s.s_end, r.e_start, r.e_end,
           ROUND((epoch_us(LEAST(s.s_end, r.e_end))
                  - epoch_us(GREATEST(s.s_start, r.e_start)))::DOUBLE
                 / 1000000.0, 6) AS overlap_s
    FROM sess s JOIN runs r
      ON s.s_start <= r.e_end AND r.e_start <= s.s_end
    """,
    tags=("range-join", "interval", "timeseries"),
)
def rj_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join: user sessions (30-min
    gaps-and-islands, same construction the session-window oracle uses)
    against corpus-wide error-burst windows (hours with >= 1.5x the mean
    error rate, contiguous hours merged into runs), reporting the overlap
    duration of every intersecting pair.

    Both interval sets are DERIVED deterministically from the events
    table (exact integer threshold: 2*cnt*nh >= 3*total), so the operator
    is self-contained and value-checked end to end.

    Plan shape (100 TB): the join is NOT a theta-join — each interval
    explodes into the day buckets it covers (sequence() per row, bounded
    by interval length), the sides equi-join on the bucket, pairs dedup,
    and the inclusive overlap predicate verifies. That is the bucketed
    interval-join pattern of rj_price_tier_bucketed extended to
    interval×interval; shuffles stay keyed and bounded. The burst-run
    islands window is a single ordered pass over the busy-HOURS relation
    — time-bounded and tiny relative to events (720 rows/month), the same
    deliberate compromise as any calendar-dimension build.
    """
    ensure_analytics_conf(spark)
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")

    s_ev = e.filter(F.col("user_id") < OVERLAP_USERS_LT)
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = s_ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w_ord).isNull()
            | (
                F.col("ts")
                >= F.lag("ts").over(w_ord) + F.expr("INTERVAL 30 MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
        "event_id",
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        flagged.withColumn("sid", F.sum("is_new").over(w_run))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
        .drop("sid")
    )

    hourly = (
        e.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("cnt"))
    )
    stats = hourly.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("nh")
    )
    busy = (
        hourly.crossJoin(F.broadcast(stats))
        .filter(2 * F.col("cnt") * F.col("nh") >= 3 * F.col("total"))
        .select(
            "h", (F.unix_micros("h") / F.lit(3600000000)).cast("long").alias("hb")
        )
    )
    w_isl = Window.orderBy("hb")
    runs = (
        busy.withColumn("grp", F.col("hb") - F.row_number().over(w_isl))
        .groupBy("grp")
        .agg(
            F.min("h").alias("e_start"),
            F.expr("max(h) + INTERVAL 1 HOUR").alias("e_end"),
        )
        .drop("grp")
    )

    s_b = sess.withColumn(
        "bucket", F.explode(F.sequence(F.to_date("s_start"), F.to_date("s_end")))
    )
    r_b = runs.withColumn(
        "bucket", F.explode(F.sequence(F.to_date("e_start"), F.to_date("e_end")))
    )
    pairs = (
        s_b.join(r_b, "bucket")
        .drop("bucket")
        .distinct()
        .filter(
            (F.col("s_start") <= F.col("e_end"))
            & (F.col("e_start") <= F.col("s_end"))
        )
    )
    overlap = (
        (
            F.unix_micros(F.least("s_end", "e_end"))
            - F.unix_micros(F.greatest("s_start", "e_start"))
        ).cast("double")
        / 1000000.0
    )
    return pairs.select(
        "user_id",
        "s_start",
        "s_end",
        "e_start",
        "e_end",
        F.round(overlap, 6).alias("overlap_s"),
    )


# --- temporally-correct SCD2 dimension join --------------------------------------

SCD2_CUSTKEY_LT = 50  # demo slice; the plan is per-key generic


@register(
    "rj_scd2_temporal_join",
    oracle=f"""
    WITH dim AS (
        SELECT o_custkey, o_orderstatus,
               o_orderdate AS valid_from,
               LEAD(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS valid_to
        FROM orders WHERE o_custkey < {SCD2_CUSTKEY_LT}
    ),
    fact AS (
        SELECT o.o_custkey, l.l_shipdate,
               CAST(ROUND(l.l_quantity * 100) AS BIGINT) AS qty_cents
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_custkey < {SCD2_CUSTKEY_LT}
    )
    SELECT d.o_orderstatus AS status_at_ship,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(f.qty_cents) AS BIGINT) AS sum_qty_cents
    FROM fact f JOIN dim d
      ON d.o_custkey = f.o_custkey
     AND f.l_shipdate >= d.valid_from
     AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)
    GROUP BY d.o_orderstatus
    ORDER BY status_at_ship
    """,
    tags=("rangejoin", "scd2", "temporal"),
)
def rj_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporally-correct dimension enrichment: each shipment joins the
    SCD2 status interval its customer was in AT SHIP TIME (half-open
    [valid_from, valid_to) containment — the standard "join fact to the
    dimension version as of event time" warehouse pattern, composing
    fx_scd2_intervals' interval builder with the range-join family).
    Zero-length intervals (same-day successive changes) contain nothing,
    exactly as SCD2 semantics require.

    Plan shape (100 TB): the containment predicate rides a plain EQUI
    join on the business key — per-key interval counts are bounded
    (a dimension's change history), so the per-key fan-out is |versions|,
    never a cross product; both sides shuffle once on custkey (or zero
    times with the bucketed warehouse layout). Contrast with
    rj_interval_overlap, where neither side has an equi key and bucketing
    must come from time itself.
    """
    ensure_analytics_conf(spark)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < SCD2_CUSTKEY_LT
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dim = o.select(
        F.col("o_custkey").alias("d_custkey"),
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    fact = o.select("o_orderkey", "o_custkey").join(
        li, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "o_custkey",
        "l_shipdate",
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_cents"),
    )
    joined = fact.join(
        dim,
        (F.col("o_custkey") == F.col("d_custkey"))
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to"))),
    )
    return (
        joined.groupBy(F.col("o_orderstatus").alias("status_at_ship"))
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("qty_cents").cast("long").alias("sum_qty_cents"),
        )
        .orderBy("status_at_ship")
    )


# --- time-range attribution join ---------------------------------------------------

ATTR_WINDOW_US = 2 * 3600 * 1_000_000  # 2-hour attribution window
ATTR_BUCKET_US = 3600 * 1_000_000  # 1-hour join buckets


@register(
    "rj_purchase_attribution_window",
    oracle=f"""
    WITH per_purchase AS (
        SELECT p.event_id,
               COUNT(c.event_id) AS n_clicks
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND epoch_us(c.ts) >= epoch_us(p.ts)
         AND epoch_us(c.ts) < epoch_us(p.ts) + {ATTR_WINDOW_US}
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per_purchase)
    SELECT n_clicks,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(*) AS BIGINT) * 1000000 // tot.n AS share_ppm
    FROM per_purchase, tot
    GROUP BY n_clicks, tot.n
    ORDER BY n_clicks
    """,
    tags=("rangejoin", "attribution", "timewindow"),
)
def rj_purchase_attribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward attribution: how many same-user clicks land inside the
    2 hours AFTER each purchase — histogram of purchases by attributed
    click count. (The aj_* family answers 'nearest single event'; this
    is the range form every attribution model starts from.)

    Scale rewrite: a time-range join is a non-equi join Spark would plan
    as BNLJ. Bucketing dissolves it — each purchase explodes to the
    ⌈window/bucket⌉+1 = 3 hour-buckets its window can touch, clicks carry
    their single bucket, and the join becomes a plain equi-join on
    (user_id, bucket) refined by the exact epoch-integer predicate. A
    click's one bucket matches at most one of a purchase's bucket rows,
    so no dedup is needed; LEFT join keeps zero-click purchases for the
    histogram's 0 bin.

    Plan shape (100 TB): one shuffle on (user_id, bucket) — high
    cardinality, skew-free — with per-key fan-out bounded by per-user
    hourly activity; epoch-integer time arithmetic (no calendar
    functions) keeps both engines on identical int64s.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.expr("unix_micros(ts)").alias("p_us"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.expr("unix_micros(ts)").alias("c_us"),
        F.expr(f"unix_micros(ts) DIV {ATTR_BUCKET_US}").alias("bucket"),
    )
    pb = p.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"p_us DIV {ATTR_BUCKET_US}"),
                F.expr(f"(p_us + {ATTR_WINDOW_US}) DIV {ATTR_BUCKET_US}"),
            )
        ),
    )
    joined = pb.join(
        c,
        (pb.user_id == c.c_user)
        & (pb.bucket == c.bucket)
        & (c.c_us >= pb.p_us)
        & (c.c_us < pb.p_us + ATTR_WINDOW_US),
        "left",
    )
    per_purchase = joined.groupBy("p_id").agg(
        F.count("c_id").alias("n_clicks")
    )
    tot = per_purchase.agg(F.count("*").cast("long").alias("n"))
    return (
        per_purchase.groupBy("n_clicks")
        .agg(F.count("*").cast("long").alias("n_purchases"))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_clicks",
            "n_purchases",
            F.expr("n_purchases * 1000000 DIV n").alias("share_ppm"),
        )
        .orderBy("n_clicks")
    )
