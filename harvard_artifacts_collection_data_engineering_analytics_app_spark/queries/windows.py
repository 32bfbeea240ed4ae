"""Window functions and event-time windows (batch form).

The streaming forms (watermarks, triggers, state) live in
``..streaming``; the queries here are the batch-equivalent semantics the
DuckDB oracle can check. Time windows align to the unix epoch in both
engines (Spark ``window()``/DuckDB ``time_bucket``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..session import ensure_analytics_conf
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_analytics_conf(spark)
    return load_table(spark, sf_dir, name)


# --- ranking window functions -------------------------------------------------


@register(
    "wf_topn_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def wf_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ROW_NUMBER (the scalable 'top-k per key' idiom).

    At 100 TB this is one shuffle on the partition key; no global sort.
    """
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "wf_rank_dense",
    oracle="""
    SELECT l_returnflag, l_quantity,
           RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS qty_rank,
           DENSE_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               AS qty_dense_rank
    FROM lineitem
    WHERE l_orderkey < 50
    """,
    tags=("window", "rank"),
)
def wf_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK and DENSE_RANK with ties (deterministic per value)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.filter(F.col("l_orderkey") < 50).select(
        "l_returnflag",
        "l_quantity",
        F.rank().over(w).cast("long").alias("qty_rank"),
        F.dense_rank().over(w).cast("long").alias("qty_dense_rank"),
    )


@register(
    "wf_running_sum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS running_value
    FROM events
    WHERE user_id < 10
    """,
    tags=("window", "running"),
)
def wf_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user in event-time order."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.filter(F.col("user_id") < 10).select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


@register(
    "wf_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ), 6) AS delta_vs_prev
    FROM events
    WHERE user_id < 10
    """,
    tags=("window", "lag"),
)
def wf_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: per-user delta vs previous event (NULL for the first)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.filter(F.col("user_id") < 10).select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_vs_prev"),
    )


@register(
    "wf_ntile_cume",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (
        PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
    )
    """,
    tags=("window", "rank"),
)
def wf_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE / PERCENT_RANK / CUME_DIST distribution functions.

    NTILE assigns ties by row position, so the window order includes the
    unique o_orderkey tie-breaker — without it the bucket assignment is
    nondeterministic across engines and shuffles.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "wf_range_frame",
    oracle="""
    SELECT event_id, user_id,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) / 100.0 AS value_last_hour,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS events_last_hour
    FROM events
    WHERE user_id < 10
    """,
    tags=("window", "range-frame"),
)
def wf_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour sliding aggregate via a RANGE window frame.

    RANGE frames are value-based: all peer rows (equal order value) are in
    or out together, so the result is deterministic even with tied
    timestamps — unlike a ROWS frame. The fixed-point cents sum keeps the
    double aggregation order-insensitive for the value hash.

    Both sides order by exact epoch MICROseconds (unix_micros / epoch_us)
    with a microsecond-scaled frame: second-granularity keys differ between
    engines (unix_timestamp floors, epoch() rounds), which flips frame
    membership for events within ~1s of a boundary on denser data.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1_000_000, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    return e.select(
        "event_id",
        "user_id",
        (F.sum(cents).over(w) / 100.0).alias("value_last_hour"),
        F.count("*").over(w).alias("events_last_hour"),
    )


# --- event-time windows (batch equivalents of the streaming ops) -----------------


@register(
    "tw_tumbling_hourly",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS cnt,
           ROUND(AVG(value), 6) AS avg_value
    FROM events
    GROUP BY window_start, event_type
    """,
    tags=("timewindow", "agg"),
)
def tw_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate (epoch-aligned)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "cnt",
            "avg_value",
        )
    )


@register(
    "tw_sliding_2h_1h",
    oracle="""
    WITH buckets AS (
        SELECT UNNEST([
                   time_bucket(INTERVAL '1 hour', ts),
                   time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour'
               ]) AS window_start,
               value
        FROM events
    )
    SELECT window_start, COUNT(*) AS cnt, ROUND(AVG(value), 6) AS avg_value
    FROM buckets
    GROUP BY window_start
    """,
    tags=("timewindow", "agg"),
)
def tw_sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour window, 1-hour slide: each event lands in 2 windows.

    The oracle expands each event into its two epoch-aligned window starts —
    the same duplication Spark's window() performs internally.
    """
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count("*").alias("cnt"), F.round(F.avg("value"), 6).alias("avg_value"))
        .select(F.col("window.start").alias("window_start"), "cnt", "avg_value")
    )


@register(
    "tw_session_30m",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, value, event_id,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
        WHERE user_id < 20
    ),
    flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN prev_ts IS NULL
                         OR ts >= prev_ts + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS is_new_session
        FROM ordered
    ),
    sessioned AS (
        SELECT user_id, ts, value,
               -- the running sum must use the SAME total order as LAG
               -- (ts, event_id): with ts-only ordering, tied-timestamp
               -- rows at a session boundary could land in either session
               SUM(is_new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS session_value
    FROM sessioned
    GROUP BY user_id, session_id
    """,
    tags=("timewindow", "session", "agg"),
)
def tw_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap (batch session_window).

    Spark merges events while each is < previous-event-time + gap; the
    oracle reproduces exactly that with gaps-and-islands (new session iff
    ts >= prev_ts + gap).
    """
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0).alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "tw_funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS c_ts
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.v_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS p_ts
        FROM events e
        JOIN c ON c.user_id = e.user_id
        JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
          AND e.ts <= v.v_ts + INTERVAL 72 HOUR
        GROUP BY e.user_id
    ),
    counts AS (
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_click,
               (SELECT COUNT(*) FROM p) AS n_purchase
    )
    SELECT step, n_users FROM counts
    UNPIVOT (n_users FOR step IN (n_view AS '1_view',
                                  n_click AS '2_view_click',
                                  n_purchase AS '3_full_funnel_72h'))
    """,
    tags=("events", "funnel", "windows"),
)
def tw_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: view → later click → later purchase,
    with the full path completing within 72 h of the first view.

    The product-analytics staple (Amplitude/Mixpanel "funnel" chart) as
    three cascaded min-timestamp aggregations — NO per-event self-join
    explosion: each stage is a groupBy(user) MIN plus an equi-join of the
    (|users|-sized) stage relation back to events. All three shuffles key
    on user_id, so a real deployment co-partitions them (AQE reuses the
    exchange); events tables bucketed by user_id make every stage
    shuffle-free. Strict ts ordering (>) keeps the step sequencing
    honest; the 72 h bound (chosen to exercise all three stages on the synthetic event cadence: 65 of 150 users convert) is exact microsecond timestamp arithmetic in
    both engines.
    """
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        e.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        e.join(c, "user_id")
        .join(v, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 72 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    counts = (
        v.agg(F.count("*").alias("n")).select(F.lit("1_view").alias("step"), "n")
        .union(
            c.agg(F.count("*").alias("n")).select(
                F.lit("2_view_click").alias("step"), "n"
            )
        )
        .union(
            p.agg(F.count("*").alias("n")).select(
                F.lit("3_full_funnel_72h").alias("step"), "n"
            )
        )
    )
    return counts.select("step", F.col("n").cast("long").alias("n_users"))


@register(
    "tw_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort_week,
               CAST(datediff('week', f.cohort_week,
                             date_trunc('week', e.ts)) AS BIGINT) AS week_offset
        FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_active
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    tags=("events", "cohort", "retention"),
)
def tw_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    once per (cohort, weeks-since-cohort) they were active in.

    The other product-analytics staple next to tw_funnel_conversion. Two
    shuffles, both on user_id-derived keys: a first-seen MIN per user,
    then a distinct (user, week_offset) before the cohort count — the
    DISTINCT is what keeps a user with 50 events in a week counted once.
    Week truncation is ISO-Monday in both engines (Spark date_trunc /
    DuckDB date_trunc agree), and the offset is computed on truncated
    week starts so partial weeks cannot skew the bucket.
    """
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active")
    )


AU_MAU_DAYS = 28
AU_WAU_DAYS = 7


@register(
    "tw_rolling_active_users",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grid AS (SELECT DISTINCT d FROM ud),
    exploded AS (
        SELECT user_id,
               CAST(d + off * INTERVAL 1 DAY AS DATE) AS day,
               off
        FROM ud CROSS JOIN (
            SELECT UNNEST(range(0, {AU_MAU_DAYS})) AS off
        )
    ),
    per_user_day AS (
        SELECT day, user_id, MIN(off) AS min_off
        FROM exploded GROUP BY day, user_id
    )
    SELECT p.day,
           CAST(SUM(CASE WHEN min_off = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dau,
           CAST(SUM(CASE WHEN min_off < {AU_WAU_DAYS} THEN 1 ELSE 0 END)
                AS BIGINT) AS wau,
           COUNT(*) AS mau
    FROM per_user_day p
    JOIN grid ON grid.d = p.day
    GROUP BY p.day
    ORDER BY p.day
    """,
    tags=("timewindow", "active-users", "distinct"),
)
def tw_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU (trailing 7 d) / MAU (trailing 28 d) per day — the
    rolling-distinct-user triple every product dashboard serves.

    A naive trailing-window COUNT(DISTINCT) re-scans up to 28 days of
    events per output day (28× read amplification) or holds a 28-day
    distinct-set per day in window state. This plan does neither: dedup
    events to (user, day) once, fan each pair out to the ≤28 future days
    it can keep active (bounded explode — output is |user-days|·28 no
    matter the event volume), then take MIN(offset) per (day, user) —
    one map-side-combinable aggregate — from which all three tiers are
    plain conditional sums: min_off=0 → active today, <7 → this week,
    any → this month. COUNT DISTINCT never appears, so no Expand plan
    and no per-day distinct state; both shuffles key on high-cardinality
    (day, user) / day.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    grid = ud.select("d").distinct()
    offs = F.array([F.lit(i) for i in range(AU_MAU_DAYS)])
    exploded = ud.select(
        "user_id", "d", F.explode(offs).alias("off")
    ).select(
        "user_id", F.expr("date_add(d, off)").alias("day"), "off"
    )
    per_user_day = exploded.groupBy("day", "user_id").agg(
        F.min("off").alias("min_off")
    )
    return (
        per_user_day.join(grid, per_user_day["day"] == grid["d"])
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("min_off") == 0, 1).otherwise(0))
            .cast("long")
            .alias("dau"),
            F.sum(F.when(F.col("min_off") < AU_WAU_DAYS, 1).otherwise(0))
            .cast("long")
            .alias("wau"),
            F.count("*").alias("mau"),
        )
        .orderBy("day")
    )


# --- user-journey Markov transitions ------------------------------------------


@register(
    "tw_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    t AS (
        SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS cnt
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT from_type, to_type, cnt,
           CAST((1000 * cnt) // SUM(cnt) OVER (PARTITION BY from_type)
                AS BIGINT) AS p_milli
    FROM t
    ORDER BY from_type, to_type
    """,
    tags=("windows", "sequence", "markov"),
)
def tw_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov chain of
    the user journey): counts and integer-milli probabilities of each
    from→to step, with steps ordered by (ts, event_id) within a user —
    the unique tie-breaker makes lag() deterministic in both engines.

    The product-analytics companion to tw_funnel_conversion: funnels test
    ONE hypothesized path, the transition matrix discovers all of them
    (next-step prediction, drop-off heatmaps, PageRank-over-journeys).

    Plan shape (100 TB): one shuffle on user_id for the per-user ordered
    lag — bucketed event tables run it shuffle-free, and the sort is
    per-user-partition, never global — then a map-side-combined count to
    the |event_type|² transition relation (tiny). Probabilities divide on
    an integer milli-grid (BIGINT DIV), so no float division is compared.
    """
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("from_type"),
    )
    t = (
        seq.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("cnt"))
    )
    return t.select(
        "from_type",
        "to_type",
        "cnt",
        F.expr("CAST((1000 * cnt) DIV SUM(cnt) OVER (PARTITION BY from_type) AS BIGINT)")
        .alias("p_milli"),
    ).orderBy("from_type", "to_type")


# --- frequent path mining -----------------------------------------------------

PATHS_TOP = 20


@register(
    "tw_top_paths",
    oracle=f"""
    WITH seq AS (
        SELECT event_type AS c,
               lag(event_type, 1) OVER w AS b,
               lag(event_type, 2) OVER w AS a
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT a || '>' || b || '>' || c AS path, COUNT(*) AS cnt
    FROM seq WHERE a IS NOT NULL
    GROUP BY path
    ORDER BY cnt DESC, path LIMIT {PATHS_TOP}
    """,
    tags=("windows", "sequence", "paths"),
)
def tw_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-PATHS_TOP(=20) most frequent 3-step user journeys (ordered
    event-type trigrams per user) — the sequential-pattern question
    behind "what do users actually do before purchasing". Completes the
    journey family: funnels test one path, transitions give one-step
    dynamics, this surfaces the dominant multi-step flows.

    Determinism: steps are ordered by (ts, event_id) within a user, and
    the top-k tie-breaks on the path string.

    Plan shape (100 TB): the SAME single user_id shuffle as
    tw_event_transitions — both lags ride one window spec, so Spark
    computes them in one sort pass — then a map-side-combined count over
    the |event_type|³ path space and a TakeOrderedAndProject for the
    top-k (per-partition heaps, never a global sort).
    """
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("c"),
        F.lag("event_type", 1).over(w).alias("b"),
        F.lag("event_type", 2).over(w).alias("a"),
    )
    return (
        seq.filter(F.col("a").isNotNull())
        .select(
            F.concat_ws(">", F.col("a"), F.col("b"), F.col("c")).alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("path"))
        .limit(PATHS_TOP)
    )


# --- per-event sessionization (gap-and-island) --------------------------------

SESSION_GAP_MIN = 30


@register(
    "tw_session_ids",
    oracle=f"""
    WITH g AS (
        SELECT event_id, user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    )) > {SESSION_GAP_MIN} * 60 * 1000000
                    OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events WHERE user_id < 50
    )
    SELECT event_id, user_id,
           CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_no
    FROM g ORDER BY user_id, session_no, event_id
    """,
    tags=("windows", "sessionize", "gaps-and-islands"),
)
def tw_session_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT sessionization (gaps-and-islands): every event gets its
    user-local session number, where a session breaks after a
    SESSION_GAP_MIN-minute silence. tw_session_30m aggregates sessions;
    this labels the raw events — the form downstream joins need
    (attribute any event to its session, join features per session,
    replay a session's events in order).

    The classic two-window composition: a lag() marks session starts
    (exact integer microsecond comparison — no float seconds), a running
    sum turns the marks into dense per-user session numbers. Both windows
    share the (user_id, (ts, event_id)) sort, so Spark evaluates them in
    ONE shuffle + sort pass — the same single-exchange profile as every
    sequence operator here; bucketed event tables drop the exchange too.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        prev_us.isNull()
        | (F.unix_micros("ts") - prev_us > SESSION_GAP_MIN * 60 * 1_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    g = e.select("event_id", "user_id", "ts", new_session.alias("new_session"))
    return (
        g.select(
            "event_id",
            "user_id",
            F.sum("new_session").over(run).cast("long").alias("session_no"),
        )
        .orderBy("user_id", "session_no", "event_id")
    )


# --- RFM customer segmentation ------------------------------------------------


@register(
    "tw_rfm_segments",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS mts FROM events),
    u AS (
        SELECT user_id,
               CAST(date_diff('day', CAST(MAX(ts) AS DATE),
                              CAST((SELECT mts FROM mx) AS DATE)) AS BIGINT)
                   AS recency_days,
               COUNT(*) AS freq,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM events WHERE user_id < 200 GROUP BY user_id
    ),
    sc AS (
        SELECT user_id, recency_days, freq, monetary_cents,
               CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS BIGINT) AS r,
               CAST(ntile(4) OVER (ORDER BY freq, user_id) AS BIGINT) AS f,
               CAST(ntile(4) OVER (ORDER BY monetary_cents, user_id) AS BIGINT) AS m
        FROM u
    )
    SELECT user_id, recency_days, freq, monetary_cents, r, f, m,
           r * 100 + f * 10 + m AS segment
    FROM sc ORDER BY user_id
    """,
    tags=("windows", "rfm", "segmentation"),
)
def tw_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per user the recency (days since last
    event, against the corpus max), frequency, and monetary value, each
    cut into quartiles, concatenated into the classic 3-digit RFM
    segment code — the standard marketing-analytics cohort operator.

    Determinism: quartiles are ntile(4) with the user_id tie-break (the
    wf_ntile_cume lesson), monetary is exact integer cents, recency is
    an integer day diff of DATEs — no timestamp float anywhere.

    Plan shape (100 TB): one map-side-combined per-user aggregation;
    the three quartile windows run over the |users| relation — orders of
    magnitude smaller than events — and the corpus max-ts is the
    broadcast scalar pattern. The full-relation ntile sort is the one
    total order; at extreme |users| swap ntile for percentile-bucket
    joins (the tx_epoch_order bucket-offset trick) on the same plan.
    """
    ev = _t(spark, sf_dir, "events")
    e = ev.filter(F.col("user_id") < 200)
    cents = F.round(F.col("value") * 100).cast("bigint")
    # Recency anchor is the CORPUS max ts (all events), matching the oracle's
    # unfiltered mx CTE — computing it on the user_id<200 subset diverges as
    # soon as the corpus max comes from a user outside the cohort.
    mx = ev.agg(F.max("ts").alias("mts"))
    u = (
        e.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("freq"),
            F.sum(cents).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff(F.col("mts").cast("date"), F.col("last_ts").cast("date"))
            .cast("long")
            .alias("recency_days"),
            "freq",
            "monetary_cents",
        )
    )
    r_w = Window.orderBy("recency_days", "user_id")
    f_w = Window.orderBy("freq", "user_id")
    m_w = Window.orderBy("monetary_cents", "user_id")
    sc = u.select(
        "user_id",
        "recency_days",
        "freq",
        "monetary_cents",
        F.ntile(4).over(r_w).cast("long").alias("r"),
        F.ntile(4).over(f_w).cast("long").alias("f"),
        F.ntile(4).over(m_w).cast("long").alias("m"),
    )
    return sc.select(
        "user_id",
        "recency_days",
        "freq",
        "monetary_cents",
        "r",
        "f",
        "m",
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("segment"),
    ).orderBy("user_id")


# --- burst detection ----------------------------------------------------------

BURST_K = 2  # burst: hourly count > K x trailing-24h hourly average
BURST_MIN_TRAIL = 12  # hours of history required before flagging


@register(
    "tw_burst_detection",
    oracle=f"""
    WITH h AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', ts) AS hr,
               epoch_us(time_bucket(INTERVAL '1 hour', ts)) // 3600000000
                   AS hr_idx,
               COUNT(*) AS cnt
        FROM events GROUP BY event_type, hr
    ),
    t AS (
        SELECT event_type, hr, cnt,
               COUNT(*) OVER w AS n_trail,
               SUM(cnt) OVER w AS trail_sum
        FROM h
        WINDOW w AS (
            PARTITION BY event_type ORDER BY hr_idx
            RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_type, hr, cnt,
           CAST(trail_sum AS BIGINT) AS trail_sum,
           CAST(n_trail AS BIGINT) AS n_trail
    FROM t
    WHERE n_trail >= {BURST_MIN_TRAIL}
      AND cnt * n_trail > {BURST_K} * trail_sum
    ORDER BY event_type, hr
    """,
    tags=("windows", "timeseries", "burst"),
)
def tw_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection (trend/spike surfacing): hours where an event
    type's volume exceeds BURST_K x its own trailing-24h hourly average,
    with a BURST_MIN_TRAIL-hour warm-up — the alerting/trending-topics
    primitive over any keyed time series.

    The trailing window is a value-based RANGE frame over the integer
    HOUR INDEX (epoch-hours), not a ROWS frame — series gaps then
    correctly shrink the trailing window instead of silently reaching
    further back in time (the wf_range_frame lesson applied to
    aggregated series). The burst test cross-multiplies
    (cnt·n > K·sum) so no float average exists to disagree on.

    Plan shape (100 TB): one map-side-combined hourly rollup, then one
    window shuffle on event_type over the |type|·|hours| relation —
    tiny relative to the fact. Streaming form: st_anomaly_flags' state
    pattern with an hourly ring buffer.
    """
    e = _t(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("cnt"))
    h = h.withColumn(
        # Integer DIV matches DuckDB's truncating `//` exactly (incl. pre-1970
        # negative epochs); double-divide-then-cast did not.
        "hr_idx", F.expr("unix_micros(hr) DIV 3600000000")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr_idx")
        .rangeBetween(-24, -1)
    )
    t = h.select(
        "event_type",
        "hr",
        "cnt",
        F.count("*").over(w).alias("n_trail"),
        F.sum("cnt").over(w).alias("trail_sum"),
    )
    return (
        t.filter(
            (F.col("n_trail") >= BURST_MIN_TRAIL)
            & (F.col("cnt") * F.col("n_trail") > BURST_K * F.col("trail_sum"))
        )
        .select(
            "event_type",
            "hr",
            "cnt",
            F.col("trail_sum").cast("bigint").alias("trail_sum"),
            F.col("n_trail").cast("bigint").alias("n_trail"),
        )
        .orderBy("event_type", "hr")
    )


# --- cumulative distinct users ------------------------------------------------


@register(
    "tw_cumulative_uniques",
    oracle="""
    WITH fs AS (
        SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS d0
        FROM events GROUP BY event_type, user_id
    ),
    d AS (
        SELECT event_type, d0 AS day, COUNT(*) AS new_users
        FROM fs GROUP BY event_type, d0
    )
    SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (
               PARTITION BY event_type ORDER BY day
           ) AS BIGINT) AS cum_users
    FROM d ORDER BY event_type, day
    """,
    tags=("windows", "distinct", "growth"),
)
def tw_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique users per event type by day — the growth-curve
    metric ("total users ever seen, as of each day"), computed by the
    FIRST-SEEN rewrite: a naive prefix COUNT(DISTINCT) re-scans a growing
    window per day (quadratic, and COUNT DISTINCT over a running frame
    isn't even expressible as one window), but each user contributes to
    exactly one day — their first — so one (type, user) aggregation plus
    a running SUM over the |type|·|days| relation is exact. Same class of
    rewrite as tw_rolling_active_users' Expand-free DAU/WAU/MAU.

    Plan shape (100 TB): one map-side-combined first-seen aggregation
    (the only pass over events), a daily count over the (much smaller)
    first-seen relation, and a running-sum window over |type|·|days|
    rows. Streaming form: the first-seen set is exactly what
    dropDuplicates-with-state maintains.
    """
    e = _t(spark, sf_dir, "events")
    fs = e.groupBy("event_type", "user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    d = fs.groupBy("event_type", F.col("d0").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        d.select(
            "event_type",
            "day",
            "new_users",
            F.sum("new_users").over(w).cast("long").alias("cum_users"),
        )
        .orderBy("event_type", "day")
    )


# --- inter-event gap statistics --------------------------------------------------


@register(
    "tw_inter_event_stats",
    oracle="""
    WITH gaps AS (
        SELECT event_type, event_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS gap_us
        FROM events
    ),
    ranked AS (
        SELECT event_type, gap_us,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY gap_us, event_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM gaps WHERE gap_us IS NOT NULL
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_gaps,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS BIGINT)
               AS median_us,
           CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_us END)
                AS BIGINT) AS p90_us
    FROM ranked GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timewindow", "inter-arrival", "percentile"),
)
def tw_inter_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-gap statistics per event type: each event's gap to
    its user's PREVIOUS event (any type), summarized as exact rank-picked
    lower-median and p90 in integer microseconds — the arrival-process
    health metric behind session-timeout tuning and bot detection.

    Exact rank selection (row ceil(n/2), ceil(9(n+1)/10)... the shared
    closed forms (n+1)//2 and (9n+9)//10) replaces interpolated
    percentiles: interpolation multiplies by an unrepresentable 0.9 whose
    rounding the two engines need not share, while rank picks are pure
    integers. Ties inside a rank break on event_id in both plans.

    Plan shape (100 TB): one user-partitioned window (the lag), one
    event_type-partitioned window (the rank) — two key-partitioned
    shuffles over the fact, then a |types|-row aggregate. For heavy-tail
    exactness at petabyte scale the rank pick swaps to the documented
    two-pass count-then-select form; the demo keeps the window because
    |gaps per type| fits a task comfortably at test scale.
    """
    e = _t(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.col("event_id")
    )
    gaps = e.select(
        "event_type",
        "event_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wl)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = gaps.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("gap_us")
                )
            )
            .cast("long")
            .alias("median_us"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(9 * n + 9) DIV 10"),
                    F.col("gap_us"),
                )
            )
            .cast("long")
            .alias("p90_us"),
        )
        .orderBy("event_type")
    )


# --- new vs returning users -------------------------------------------------------


@register(
    "tw_new_vs_returning",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    )
    SELECT d.day,
           CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM daily d JOIN firsts f USING (user_id)
    GROUP BY d.day
    ORDER BY d.day
    """,
    tags=("timewindow", "retention", "first-seen"),
)
def tw_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the standard growth-accounting
    series (every product dashboard's first chart), computed by the same
    first-seen rewrite as tw_cumulative_uniques: each user's first day is
    ONE aggregate over the (user, day) distinct relation, then every
    active day classifies against it with a user-keyed join.

    Plan shape (100 TB): one (user, day) distinct (map-side partial), one
    |users|-row first-seen aggregate, one user-partitioned equi-join —
    no window at all, nothing re-scans history per day. Both relations
    shuffle on user_id and can share the bucketed layout.
    """
    e = _t(spark, sf_dir, "events")
    daily = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    firsts = daily.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        daily.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("long"))
            .cast("long")
            .alias("new_users"),
            F.sum((F.col("day") > F.col("first_day")).cast("long"))
            .cast("long")
            .alias("returning_users"),
        )
        .orderBy("day")
    )


# --- last-observation-carried-forward (LOCF) ------------------------------------

LOCF_USERS_LT = 40  # bounded output slice for the value check


@register(
    "wf_locf_forward_fill",
    oracle=f"""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase'
                           THEN CAST(ROUND(value * 100) AS BIGINT) END
                      IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS carried_cents
    FROM events
    WHERE user_id < {LOCF_USERS_LT}
    ORDER BY user_id, event_id
    """,
    tags=("window", "locf", "imputation"),
)
def wf_locf_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: every event carries the user's
    most recent PURCHASE value forward in event-time — the standard
    imputation/state-propagation window (sensor gap fill, "price at time
    of click", sessionless attribute carry) expressed as an ignore-nulls
    running last_value. NULL before a user's first purchase, by
    definition; values are integer cents; ordering ties break on
    event_id so both engines walk identical frames.

    Plan shape (100 TB): ONE user-partitioned running window (no
    self-join, no as-of join) — the frame is running, so window state is
    a single value per partition, and the user_id shuffle is the same
    exchange every per-user operator already pays. ht_gap_fill fills a
    time GRID; this fills the raw event sequence, which is why both
    exist.
    """
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < LOCF_USERS_LT)
    pc = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100).cast("bigint"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.last(pc, ignorenulls=True).over(w).alias("carried_cents"),
        )
        .orderBy("user_id", "event_id")
    )


# --- DAU/MAU stickiness ratio ----------------------------------------------------


@register(
    "tw_dau_stickiness",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grid AS (SELECT DISTINCT d FROM ud),
    exploded AS (
        SELECT user_id,
               CAST(d + off * INTERVAL 1 DAY AS DATE) AS day,
               off
        FROM ud CROSS JOIN (
            SELECT UNNEST(range(0, {AU_MAU_DAYS})) AS off
        )
    ),
    per_user_day AS (
        SELECT day, user_id, MIN(off) AS min_off
        FROM exploded GROUP BY day, user_id
    ),
    tiers AS (
        SELECT p.day,
               CAST(SUM(CASE WHEN min_off = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dau,
               COUNT(*) AS mau
        FROM per_user_day p
        JOIN grid ON grid.d = p.day
        GROUP BY p.day
    )
    SELECT day, dau, mau, (dau * 1000000) // mau AS stickiness_ppm
    FROM tiers ORDER BY day
    """,
    tags=("timewindow", "active-users", "stickiness"),
)
def tw_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the engagement ratio product teams
    track next to the active-user tiers ("what fraction of the monthly
    audience shows up on a given day"), on the same trailing-28-day
    definition as tw_rolling_active_users and the same bounded-explode
    rewrite (each (user, day) fans out to the ≤28 days it keeps active;
    MIN(offset) per (day, user) yields every tier in one aggregate — no
    28× re-scan, no per-day distinct state). The ratio is integer ppm
    via the cross-engine truncating division.
    """
    ensure_analytics_conf(spark)
    ud = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    grid = ud.select("d").distinct()
    exploded = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(AU_MAU_DAYS - 1))).alias("off"),
        "d",
    ).select("user_id", F.expr("date_add(d, off)").alias("day"), "off")
    per_user_day = exploded.groupBy("day", "user_id").agg(
        F.min("off").alias("min_off")
    )
    tiers = (
        per_user_day.join(grid, per_user_day["day"] == grid["d"])
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("min_off") == 0, 1).otherwise(0))
            .cast("long")
            .alias("dau"),
            F.count("*").alias("mau"),
        )
    )
    return tiers.select(
        "day",
        "dau",
        "mau",
        F.expr("(dau * 1000000) DIV mau").alias("stickiness_ppm"),
    ).orderBy("day")


# --- session-duration histogram --------------------------------------------------

SESS_HIST_BIN_MIN = 10  # histogram bin width (minutes)
SESS_HIST_MAX_BIN = 6  # 60+ minutes clamp into the last bin


@register(
    "tw_session_duration_histogram",
    oracle=f"""
    WITH g AS (
        SELECT event_id, user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    )) > {{GAP}} * 60 * 1000000
                    OR lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                    ) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    s AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM g
    ),
    sess AS (
        SELECT user_id, session_no,
               COUNT(*) AS n_events,
               (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 60000000
                   AS duration_min
        FROM s GROUP BY user_id, session_no
    )
    SELECT least(duration_min // {SESS_HIST_BIN_MIN}, {SESS_HIST_MAX_BIN})
               AS bin,
           CAST(least(duration_min // {SESS_HIST_BIN_MIN}, {SESS_HIST_MAX_BIN})
                * {SESS_HIST_BIN_MIN} AS BIGINT) AS bin_lo_min,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events_total
    FROM sess
    GROUP BY bin ORDER BY bin
    """.replace("{GAP}", str(SESSION_GAP_MIN)),
    tags=("timewindow", "sessionize", "histogram"),
)
def tw_session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration histogram over the FULL corpus (all users, not
    tw_session_ids' bounded slice): sessionize with the shared
    SESSION_GAP_MIN gap rule, then bin each session's first-to-last-event
    span into {SESS_HIST_BIN_MIN}-minute buckets (60+ clamped) — the
    engagement-distribution report sessionization exists to feed, and
    the sanity check on the gap parameter itself (a spike in bin 0 means
    the gap is splitting real visits).

    Durations are integer minutes via epoch-microsecond arithmetic under
    the pinned-UTC session (the cross-engine timestamp convention), so
    bins are exact on both engines.

    Plan shape (100 TB): two user-partitioned windows (lag + running
    sum — one shuffle), a (user, session) aggregate on the same keys,
    and a constant-width histogram agg. Nothing leaves the user
    partitioning until seven bins remain.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    new_session = F.when(
        F.lag("ts").over(worder).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(worder))
            > gap_us
        ),
        1,
    ).otherwise(0)
    wrun = worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = e.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(new_session).over(wrun).alias("session_no"),
    )
    sess = s.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.expr(
            "(unix_micros(max(ts)) - unix_micros(min(ts))) DIV 60000000"
        ).alias("duration_min"),
    )
    bin_ = F.least(
        F.expr(f"duration_min DIV {SESS_HIST_BIN_MIN}"),
        F.lit(SESS_HIST_MAX_BIN).cast("long"),
    )
    return (
        sess.select(bin_.alias("bin"), "n_events")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events_total"),
        )
        .select(
            "bin",
            (F.col("bin") * SESS_HIST_BIN_MIN).cast("long").alias("bin_lo_min"),
            "n_sessions",
            "n_events_total",
        )
        .orderBy("bin")
    )


# --- day-over-day churn --------------------------------------------------------------


@register(
    "tw_churn_rate",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    )
    SELECT a.day,
           COUNT(*) AS active,
           CAST(COUNT(*) FILTER (WHERE b.user_id IS NULL) AS BIGINT)
               AS churned,
           (COUNT(*) FILTER (WHERE b.user_id IS NULL) * 1000000) // COUNT(*)
               AS churn_ppm
    FROM ud a
    LEFT JOIN ud b
      ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
    WHERE a.day < (SELECT MAX(day) FROM ud)
    GROUP BY a.day
    ORDER BY a.day
    """,
    tags=("timewindow", "churn", "retention"),
)
def tw_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day churn: of the users active on day d, how many have NO
    activity on day d+1 — the complement of next-day retention and the
    first derivative every growth dashboard tracks. The final (partial)
    day is excluded: its "next day" is unobserved, not churned.

    Plan shape (100 TB): events collapse to the DISTINCT (day, user)
    relation first (map-side-combined, the same bounded user-day
    relation tw_dau_stickiness reuses — days × users, never raw
    events), then ONE self equi-join on (user, day+1) — both sides hash
    on user_id, so the join co-partitions with the distinct's shuffle —
    and a per-day count. Nothing wider than user-day rows moves.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    last_day = ud.agg(F.max("day")).first()[0]
    nxt = ud.select(
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("user_id").alias("user_id"),
        F.lit(1).alias("seen_next"),
    )
    return (
        ud.filter(F.col("day") < F.lit(last_day))
        .join(nxt, ["day", "user_id"], "left")
        .groupBy("day")
        .agg(
            F.count("*").alias("active"),
            F.count_if(F.col("seen_next").isNull())
            .cast("long")
            .alias("churned"),
            F.expr(
                "(count_if(seen_next IS NULL) * 1000000) DIV count(*)"
            ).alias("churn_ppm"),
        )
        .orderBy("day")
    )


# --- centered rolling median ---------------------------------------------------------


@register(
    "wf_rolling_median",
    oracle="""
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS cnt
        FROM events GROUP BY event_type, hr
    )
    SELECT event_type, hr, cnt,
           l[(len(l) + 1) // 2] AS med
    FROM (
        SELECT event_type, hr, cnt,
               list_sort(list(cnt) OVER (
                   PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING
               )) AS l
        FROM h
    )
    ORDER BY event_type, hr
    """,
    tags=("window", "rolling-median", "smoothing"),
)
def wf_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 5-point rolling MEDIAN over each event type's hourly
    count series — the robust smoother that survives single-bucket
    spikes an EWMA or rolling mean would smear (the standard pre-step
    before change-point detection on noisy series).

    Exactness: the median is a RANK-PICK (element (n+1)//2 of the sorted
    frame, lower median on even frames) on exact integer counts — never
    an interpolated percentile, which the two engines round differently
    (the standing cross-engine percentile rule). Frames are ROWS-based
    (2 preceding / 2 following), identical semantics in both engines,
    and truncated symmetrically at series edges.

    Plan shape (100 TB): one map-side-combined hourly aggregation, then
    a window partitioned BY EVENT TYPE — bounded frames (≤5 rows)
    over bounded partitions (hours/type), no global sort, state O(frame)
    per row. collect_list is safe here because the frame is a 5-element
    constant, then sorted per-row for the rank pick.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-2, 2)
    )
    arr = F.array_sort(F.collect_list("cnt").over(w))
    med = F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))
    return h.select(
        "event_type", "hr", "cnt", med.alias("med")
    ).orderBy("event_type", "hr")


# --- weekly activity heatmap -----------------------------------------------------------


@register(
    "tw_activity_heatmap",
    oracle="""
    WITH h AS (
        SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
               (epoch_us(ts) // 3600000000) % 24 AS hod,
               COUNT(*) AS n_events
        FROM events GROUP BY dow, hod
    ),
    t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM h)
    SELECT dow, hod, CAST(n_events AS BIGINT) AS n_events,
           (n_events * 1000000) // t.total AS share_ppm
    FROM h, t
    ORDER BY dow, hod
    """,
    tags=("timewindow", "heatmap", "seasonality"),
)
def tw_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly activity heatmap behind every ops dashboard: event
    counts per (day-of-week, hour-of-day) cell with each cell's corpus
    share in ppm — load-shape input for capacity planning and the quick
    eyeball for bot traffic (flat hod profile) or timezone skew.

    Day/hour indices are EPOCH-INTEGER arithmetic (epoch-days % 7,
    epoch-hours % 24 — ht_dow_seasonal's idiom), never calendar
    functions, so no engine pair can disagree on week-start or DST
    conventions; UTC sessions make wall-time meaning explicit.

    Plan shape (100 TB): one map-side-combined aggregation to the ≤168
    cell relation; the total rides a 1-row cross join. Nothing else
    moves.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(
        F.expr("(unix_micros(ts) DIV 86400000000) % 7").alias("dow"),
        F.expr("(unix_micros(ts) DIV 3600000000) % 24").alias("hod"),
    ).agg(F.count("*").alias("n_events"))
    t = h.agg(F.sum("n_events").cast("long").alias("total"))
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            "dow",
            "hod",
            F.col("n_events").cast("long").alias("n_events"),
            F.expr("(n_events * 1000000) DIV total").alias("share_ppm"),
        )
        .orderBy("dow", "hod")
    )


# --- A/B experiment readout ------------------------------------------------------

# Unit of analysis = user (the standard guard against within-user
# correlation inflating significance); arm = user_id parity, the kind of
# deterministic hash split a real assignment service produces.


@register(
    "tw_experiment_readout",
    oracle="""
    WITH unit AS (
        SELECT event_type,
               user_id,
               user_id % 2 AS arm,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        GROUP BY event_type, user_id
    ),
    arm_stats AS (
        SELECT event_type, arm,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS BIGINT) AS ss
        FROM unit GROUP BY event_type, arm
    ),
    wide AS (
        SELECT a.event_type,
               a.n AS n_a, a.s AS s_a, a.ss AS ss_a,
               b.n AS n_b, b.s AS s_b, b.ss AS ss_b
        FROM arm_stats a JOIN arm_stats b ON a.event_type = b.event_type
        WHERE a.arm = 0 AND b.arm = 1
    )
    SELECT event_type, n_a, n_b,
           CAST(s_a // n_a AS BIGINT) AS mean_a_cents,
           CAST(s_b // n_b AS BIGINT) AS mean_b_cents,
           CAST(ROUND((CAST(s_a AS DOUBLE) * n_b / (CAST(s_b AS DOUBLE) * n_a)
                       - 1.0) * 1000000) AS BIGINT) AS lift_ppm,
           CAST(ROUND(
               (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
               / SQRT(
                   (CAST(n_a AS DOUBLE) * ss_a - CAST(s_a AS DOUBLE) * s_a)
                     / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1))
                   + (CAST(n_b AS DOUBLE) * ss_b - CAST(s_b AS DOUBLE) * s_b)
                     / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1)))
               * 1000) AS BIGINT) AS welch_t_milli,
           CAST(ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                      / (n_a + n_b) * 1000) AS BIGINT) AS srm_chi2_milli
    FROM wide
    ORDER BY event_type
    """,
    tags=("experiment", "abtest", "statistics"),
)
def tw_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: per event_type, user-level Welch t-test
    between the two deterministic assignment arms (user_id parity), plus
    relative lift and a sample-ratio-mismatch chi-square.

    Cross-engine exactness: per-user metrics and all first/second moments
    are EXACT integer cents (cents² sums stay < 2^63 at any realistic
    SF); the t statistic, lift, and SRM χ² are computed as doubles FROM
    those exact integers — bit-identical inputs + IEEE ops — then rounded
    onto milli/ppm grids.

    Plan shape (100 TB): two map-side-combined aggregations — events →
    (event_type, user) units, units → (event_type, arm) moments — then a
    self-join of the 2·|event_types| moment rows. The expensive shuffle
    keys on (event_type, user_id): high cardinality, no skew. This is the
    exact plan an experimentation platform's nightly readout runs.
    """
    e = _t(spark, sf_dir, "events")
    unit = (
        e.groupBy("event_type", "user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
        )
        .withColumn("arm", F.col("user_id") % 2)
    )
    arm_stats = unit.groupBy("event_type", "arm").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    a = arm_stats.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("ss").alias("ss_a"),
    )
    b = arm_stats.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("ss").alias("ss_b"),
    )
    return (
        a.join(b, "event_type")
        .selectExpr(
            "event_type",
            "n_a",
            "n_b",
            "s_a DIV n_a AS mean_a_cents",
            "s_b DIV n_b AS mean_b_cents",
            "CAST(ROUND((CAST(s_a AS DOUBLE) * n_b / (CAST(s_b AS DOUBLE) * n_a)"
            " - 1.0D) * 1000000) AS BIGINT) AS lift_ppm",
            "CAST(ROUND("
            " (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)"
            " / SQRT("
            "   (CAST(n_a AS DOUBLE) * ss_a - CAST(s_a AS DOUBLE) * s_a)"
            "     / (CAST(n_a AS DOUBLE) * n_a * (n_a - 1))"
            "   + (CAST(n_b AS DOUBLE) * ss_b - CAST(s_b AS DOUBLE) * s_b)"
            "     / (CAST(n_b AS DOUBLE) * n_b * (n_b - 1)))"
            " * 1000) AS BIGINT) AS welch_t_milli",
            "CAST(ROUND(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)"
            " / (n_a + n_b) * 1000) AS BIGINT) AS srm_chi2_milli",
        )
        .orderBy("event_type")
    )


# --- power-user concentration curve ----------------------------------------------


@register(
    "tw_power_user_curve",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n_events
        FROM events GROUP BY user_id
    ),
    tot AS (SELECT SUM(n_events) AS total FROM per_user),
    ranked AS (
        SELECT n_events,
               CAST(NTILE(10) OVER (ORDER BY n_events, user_id) AS INTEGER)
                   AS decile
        FROM per_user
    ),
    per_decile AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(n_events) AS BIGINT) AS events
        FROM ranked GROUP BY decile
    )
    SELECT decile, n_users, events,
           CAST(events * 1000000 // tot.total AS BIGINT) AS share_ppm,
           CAST(CAST(SUM(events) OVER (ORDER BY decile) AS BIGINT)
                * 1000000 // tot.total AS BIGINT) AS cum_share_ppm
    FROM per_decile, tot
    ORDER BY decile
    """,
    tags=("activity", "distribution", "window"),
)
def tw_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user concentration (Lorenz-style) curve: users in activity
    deciles, each decile's share and cumulative share of all events —
    the 'what fraction of traffic do the top 10% generate' readout.

    Determinism: NTILE is ordered by (n_events, user_id) — a total order
    — so decile assignment is identical across engines; shares are exact
    integer ppm.

    Plan shape (100 TB): one map-side-combined per-user count (the only
    fact-sized shuffle), then NTILE over the |users| relation. A global
    NTILE is a single-reducer sort in naive form; at cluster scale the
    decile boundaries would come from approx/exact percentiles of
    n_events computed distributively (the fx_equidepth_histogram
    two-level decomposition) — here |users| ≪ |events| by 4 orders, so
    the window cost is already negligible and exactness wins.
    """
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count("*").alias("n_events"))
    ranked = per_user.select(
        "n_events",
        F.ntile(10)
        .over(Window.orderBy(F.asc("n_events"), F.asc("user_id")))
        .alias("decile"),
    )
    per_decile = ranked.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("n_events").alias("events"),
    )
    total = per_user.agg(F.sum("n_events").alias("total"))
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_decile.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_users",
            "events",
            F.expr("events * 1000000 DIV total").alias("share_ppm"),
            (F.sum("events").over(wcum) * 1000000)
            .cast("bigint")
            .alias("_cum_scaled"),
            "total",
        )
        .withColumn("cum_share_ppm", F.expr("_cum_scaled DIV total"))
        .select("decile", "n_users", "events", "share_ppm", "cum_share_ppm")
        .orderBy("decile")
    )


# --- retention half-life fit -------------------------------------------------------

RET_LN_SCALE = 1_000  # ln() quantization grid (the tx_zipf_fit idiom)
RET_MAX_AGE = 28  # fit ages 1..28 days


@register(
    "tw_retention_halflife",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id,
               CAST(MIN(epoch_us(ts)) // 86400000000 AS BIGINT) AS cohort_day
        FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM firsts),
    ages AS (
        SELECT DISTINCT e.user_id,
               CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - f.cohort_day
                   AS age
        FROM events e JOIN firsts f ON f.user_id = e.user_id
    ),
    curve AS (
        SELECT age,
               CAST(COUNT(*) AS BIGINT) * 1000000 // tot.n_users AS r_ppm
        FROM ages, tot
        WHERE age BETWEEN 1 AND {RET_MAX_AGE}
        GROUP BY age, tot.n_users
    ),
    pts AS (
        SELECT CAST(age AS BIGINT) AS x,
               CAST(floor(ln(r_ppm::DOUBLE / 1000000) * {RET_LN_SCALE} + 0.5)
                    AS BIGINT) AS y
        FROM curve WHERE r_ppm > 0
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM pts
    )
    SELECT n AS n_ages,
           CASE WHEN (n * sxx - sx * sx) <> 0 THEN
               CAST((n * sxy - sx * sy) * 1000000
                    // ((n * sxx - sx * sx) * {RET_LN_SCALE}) AS BIGINT)
           END AS slope_micro_per_day,
           CASE WHEN (n * sxy - sx * sy) <> 0
                 AND (n * sxx - sx * sx) <> 0 THEN
               CAST(ROUND(-693147000.0
                          / ((n * sxy - sx * sy) * 1000000.0
                             / ((n * sxx - sx * sx) * {RET_LN_SCALE})))
                    AS BIGINT)
           END AS halflife_milli_days
    FROM s
    """,
    tags=("events", "retention", "regression"),
)
def tw_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-decay fit: the pooled daily retention curve r(age) =
    share of all users active `age` days after their first event, fit as
    ln r = a + b·age by exact least squares — slope and half-life
    (ln 2 / −b) are the two numbers a growth team quotes from every
    retention curve, and the exponential fit is the standard first model
    (constant per-day churn hazard).

    Cross-engine exactness is the tx_zipf_fit recipe: each ln value is
    quantized onto the 1e3 grid IMMEDIATELY (floor(ln·1000 + 0.5)), so
    the least-squares moments are exact BIGINT sums of identical
    integers; the slope is the truncating-DIV pair and the half-life is
    one IEEE division/round from those exact integers.

    Plan shape (100 TB): a per-user MIN (map-side combined), one
    distinct (user, age) projection, then the RET_MAX_AGE(=28)-row curve
    — all fact-sized shuffles key on user_id. The regression runs over
    at most 28 points in a single 1-row aggregate.
    """
    e = _t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.expr("CAST(MIN(unix_micros(ts)) DIV 86400000000 AS BIGINT)").alias(
            "cohort_day"
        )
    )
    n_users = firsts.count()
    ages = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            (
                F.expr("unix_micros(ts) DIV 86400000000") - F.col("cohort_day")
            ).alias("age"),
        )
        .distinct()
    )
    curve = (
        ages.filter(F.col("age").between(1, RET_MAX_AGE))
        .groupBy("age")
        .agg(
            F.expr(f"COUNT(*) * 1000000 DIV {n_users}").alias("r_ppm")
        )
    )
    pts = curve.filter(F.col("r_ppm") > 0).select(
        F.col("age").cast("long").alias("x"),
        F.expr(
            f"CAST(FLOOR(LN(CAST(r_ppm AS DOUBLE) / 1000000) * {RET_LN_SCALE}"
            " + 0.5) AS BIGINT)"
        ).alias("y"),
    )
    # Degenerate-curve guards (ADVICE r10): a flat/rising curve (zero
    # slope numerator) or a single fitted point (zero denominator) must
    # be NULL on BOTH engines — unguarded, non-ANSI Spark nulls/inf-casts
    # while DuckDB errors on integer-// by zero, a cross-engine split.
    return pts.agg(
        F.count("*").cast("long").alias("n_ages"),
        F.expr(
            "CASE WHEN (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) <> 0 THEN "
            "CAST((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)) * 1000000"
            f" DIV ((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) * {RET_LN_SCALE})"
            " AS BIGINT) END"
        ).alias("slope_micro_per_day"),
        F.expr(
            "CASE WHEN (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)) <> 0"
            " AND (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) <> 0 THEN "
            "CAST(ROUND(-693147000.0D"
            " / ((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)) * 1000000.0D"
            f" / ((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) * {RET_LN_SCALE})))"
            " AS BIGINT) END"
        ).alias("halflife_milli_days"),
    )
