"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN; the scalable formulation is the
union-and-carry trick — one shuffle on the key, no range explosion:

1. tag left (probe) and right (reference) rows, union them;
2. window per key ordered by (ts, side, id): ``last(right_payload,
   ignorenulls=True)`` carries the latest reference row forward;
3. keep probe rows.

Right rows sort before left rows at equal timestamps, so semantics are
``right.ts <= left.ts`` — matching DuckDB's ``ASOF LEFT JOIN`` with
``ON l.ts >= r.ts`` used as the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from ..queries.registry import register
from ..session import ensure_analytics_conf


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: tuple[str, ...],
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join per `on` key: backward (right.ts <= left.ts, the most
    recent preceding reference row) or forward (right.ts >= left.ts, the
    earliest following one).

    Returns left columns + the requested right payload columns (NULL when
    no reference row qualifies). Forward is the same union-and-carry plan
    with the window order reversed — still one shuffle on the key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rt = right.withColumn("_side", F.lit(0)).withColumn("_ats", F.col(right_ts))

    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    rt = rt.withColumn("_payload", payload_struct)
    lt = lt.withColumn("_payload", F.lit(None).cast(rt.schema["_payload"].dataType))

    cols = [on, "_side", "_ats", "_payload"]
    lcols = [c for c in left.columns if c != on]
    merged = lt.select(*cols, *lcols).unionByName(
        rt.select(*cols), allowMissingColumns=True
    )

    ats = F.col("_ats").asc() if direction == "backward" else F.col("_ats").desc()
    order = [ats, F.col("_side").asc()]
    if tie_break:
        # tie-break among reference rows with identical timestamps; it
        # lives inside the payload struct after the union (NULL on probe
        # rows, which _side already orders last).
        tb = F.col(f"_payload.{tie_break}")
        order.append(
            tb.asc_nulls_first() if direction == "backward" else tb.desc_nulls_first()
        )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "_matched", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        on,
        *lcols,
        *[F.col(f"_matched.{c}").alias(f"asof_{c}") for c in right_payload],
    )
    return out


@register(
    "aj_purchase_last_click",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT event_id AS click_event_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.click_event_id AS asof_click_event_id,
           c.click_ts AS asof_click_ts,
           CAST(epoch_us(p.ts) - epoch_us(c.click_ts) AS BIGINT) AS micros_since_click
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    tags=("asof", "join", "events"),
)
def aj_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at-or-before it.

    One shuffle on user_id regardless of table sizes — the canonical
    event-attribution as-of join.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_payload=("click_event_id", "click_ts"),
        tie_break="click_event_id",
    )
    return joined.withColumn(
        "micros_since_click",
        (F.unix_micros("ts") - F.unix_micros("asof_click_ts")).cast("bigint"),
    )


@register(
    "aj_purchase_next_click",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT event_id AS click_event_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.click_event_id AS asof_click_event_id,
           c.click_ts AS asof_click_ts
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts <= c.click_ts
    """,
    tags=("asof", "join", "events", "forward"),
)
def aj_purchase_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: the user's earliest click at-or-after each purchase
    (post-purchase behavior attribution) — same one-shuffle carry plan
    with the window order reversed."""
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_payload=("click_event_id", "click_ts"),
        tie_break="click_event_id",
        direction="forward",
    )


@register(
    "aj_purchase_nearest_click",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT event_id AS click_event_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    b AS (
        SELECT p.event_id, p.user_id, p.ts,
               c.click_event_id AS b_id, c.click_ts AS b_ts
        FROM purchases p
        ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.click_ts
    ),
    f AS (
        SELECT p.event_id, c.click_event_id AS f_id, c.click_ts AS f_ts
        FROM purchases p
        ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts <= c.click_ts
    ),
    j AS (
        SELECT b.*, f.f_id, f.f_ts,
               (f.f_id IS NULL OR (b.b_id IS NOT NULL
                    AND epoch_us(b.ts) - epoch_us(b.b_ts)
                        <= epoch_us(f.f_ts) - epoch_us(b.ts))) AS pick_b
        FROM b JOIN f USING (event_id)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN pick_b THEN b_id ELSE f_id END AS nearest_click_event_id,
           CASE WHEN pick_b THEN b_ts ELSE f_ts END AS nearest_click_ts,
           CAST(CASE WHEN pick_b THEN epoch_us(ts) - epoch_us(b_ts)
                     ELSE epoch_us(f_ts) - epoch_us(ts) END AS BIGINT)
               AS abs_micros,
           CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                WHEN pick_b THEN 'backward' ELSE 'forward' END AS direction
    FROM j
    """,
    tags=("asof", "join", "events", "nearest"),
)
def aj_purchase_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-either-direction as-of: for each purchase, the user's
    closest click in TIME, before or after — the sensor-fusion /
    record-linkage form of as-of (pandas merge_asof direction='nearest'),
    completing the backward/forward family.

    Composed from the two carry-based directional joins (each one keyed
    shuffle, no range explosion) + a 1:1 merge choosing the smaller
    absolute gap; ties at equal distance resolve backward, and both
    engines compose the SAME directional primitives, so the choice is
    value-exact. No new shuffle class: two window passes over the same
    user_id partitioning (AQE reuses the exchange profile) and an
    event_id equi-join of two |purchases|-sized relations.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    b = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_payload=("click_event_id", "click_ts"),
        tie_break="click_event_id",
        direction="backward",
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_click_event_id").alias("b_id"),
        F.col("asof_click_ts").alias("b_ts"),
    )
    f = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_payload=("click_event_id", "click_ts"),
        tie_break="click_event_id",
        direction="forward",
    ).select(
        F.col("event_id").alias("f_event_id"),
        F.col("asof_click_event_id").alias("f_id"),
        F.col("asof_click_ts").alias("f_ts"),
    )
    j = b.join(f, b["event_id"] == f["f_event_id"]).drop("f_event_id")
    db = F.unix_micros("ts") - F.unix_micros("b_ts")
    df_ = F.unix_micros("f_ts") - F.unix_micros("ts")
    pick_b = F.col("f_id").isNull() | (F.col("b_id").isNotNull() & (db <= df_))
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "nearest_click_event_id"
        ),
        F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
            "nearest_click_ts"
        ),
        F.when(pick_b, db).otherwise(df_).cast("bigint").alias("abs_micros"),
        F.when(
            F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(None)
        )
        .when(pick_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


# --- as-of with tolerance -----------------------------------------------------

ASOF_TOL_MICROS = 1_800_000_000  # 30 min: attribution window


@register(
    "aj_purchase_last_click_tol",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
        SELECT event_id AS click_event_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.click_ts)
                     <= {ASOF_TOL_MICROS}
                THEN c.click_event_id END AS asof_click_event_id,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.click_ts)
                     <= {ASOF_TOL_MICROS}
                THEN c.click_ts END AS asof_click_ts,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.click_ts)
                     <= {ASOF_TOL_MICROS}
                THEN CAST(epoch_us(p.ts) - epoch_us(c.click_ts) AS BIGINT)
           END AS micros_since_click
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    tags=("asof", "join", "events", "tolerance"),
)
def aj_purchase_last_click_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a TOLERANCE window (pandas merge_asof's
    ``tolerance=`` / QuestDB's bounded ASOF): a purchase attributes to its
    most recent preceding click only when that click is within 30
    minutes; otherwise the match columns are NULL — the marketing
    attribution-window rule.

    For the BACKWARD direction a post-hoc null-out is exactly
    merge_asof's semantics: candidates earlier than the nearest preceding
    click are strictly farther away, so "nearest within tolerance" and
    "nearest, then tolerance-filtered" coincide (not true for 'nearest'
    direction — there the filter must precede the 1:1 choice).

    Plan shape (100 TB): identical to aj_purchase_last_click — ONE
    user_id shuffle via the union-and-carry window; the tolerance test is
    a scalar projection on top, adding nothing to the exchange.
    """
    base = aj_purchase_last_click(spark, sf_dir)
    in_tol = F.col("micros_since_click") <= ASOF_TOL_MICROS
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_tol, F.col("asof_click_event_id")).alias(
            "asof_click_event_id"
        ),
        F.when(in_tol, F.col("asof_click_ts")).alias("asof_click_ts"),
        F.when(in_tol, F.col("micros_since_click")).alias(
            "micros_since_click"
        ),
    )


# --- error-context as-of (same-relation probe/reference) --------------------------


@register(
    "aj_error_last_action",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               last_value(CASE WHEN event_type <> 'error' THEN event_type END
                          IGNORE NULLS) OVER w AS prior_type,
               last_value(CASE WHEN event_type <> 'error' THEN epoch_us(ts) END
                          IGNORE NULLS) OVER w AS prior_us
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY ts,
                     CASE WHEN event_type = 'error' THEN 1 ELSE 0 END,
                     event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        )
    )
    SELECT COALESCE(prior_type, 'none') AS prior_type,
           CAST(COUNT(*) AS BIGINT) AS n_errors,
           CAST(SUM(epoch_us(ts) - prior_us) // COUNT(*) AS BIGINT)
               AS mean_lag_micros,
           CAST(MAX(epoch_us(ts) - prior_us) AS BIGINT) AS max_lag_micros
    FROM seq
    WHERE event_type = 'error'
    GROUP BY prior_type
    ORDER BY prior_type
    """,
    tags=("asof", "events", "diagnostics"),
)
def aj_error_last_action(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What was the user doing right before each error? As-of join every
    error event backward to the same user's most recent prior NON-error
    event, then profile errors by that prior action (count, mean/max
    lag) — the triage table an on-call reads to see which action
    precedes failures.

    Because probe and reference come from the SAME relation, the
    union-and-carry as-of (asof_join's plan) degenerates to a single
    window pass: one shuffle on user_id, ``last(payload, ignorenulls)``
    carrying the latest non-error forward. Tie order inside an equal
    timestamp: reference rows sort BEFORE the error (backward ts<=
    semantics) and among equal-ts references the highest event_id wins —
    the same (ts, side, id) total order asof_join pins, replayed
    verbatim by the oracle's WINDOW clause.

    Plan shape (100 TB): ONE shuffle on user_id (high cardinality), then
    a map-side-combined aggregation to ≤|event_types| rows. Lags are
    exact epoch-micro integers; the mean is the truncating DIV pair.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            F.when(F.col("event_type") == "error", 1).otherwise(0).asc(),
            F.col("event_id").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    non_err_type = F.when(
        F.col("event_type") != "error", F.col("event_type")
    )
    non_err_us = F.when(
        F.col("event_type") != "error", F.expr("unix_micros(ts)")
    )
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(non_err_type, ignorenulls=True).over(w).alias("prior_type"),
        F.last(non_err_us, ignorenulls=True).over(w).alias("prior_us"),
    )
    return (
        seq.filter(F.col("event_type") == "error")
        .groupBy(F.coalesce("prior_type", F.lit("none")).alias("prior_type"))
        .agg(
            F.count("*").cast("long").alias("n_errors"),
            F.expr(
                "CAST(SUM(unix_micros(ts) - prior_us) DIV COUNT(*) AS BIGINT)"
            ).alias("mean_lag_micros"),
            F.max(F.expr("unix_micros(ts) - prior_us"))
            .cast("long")
            .alias("max_lag_micros"),
        )
        .orderBy("prior_type")
    )
