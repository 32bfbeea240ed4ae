"""Skew-mitigation operators: salted two-phase aggregation + salted join.

AQE handles many skewed *joins* automatically, but only by splitting
oversized shuffle partitions post-hoc — it cannot split a single hot KEY
whose rows must still meet matching build rows, and it never fires under
sort-merge-bucketed or hinted strategies. Skewed *aggregations* on a
low-cardinality or power-law key likewise funnel every row of a hot key
through one reducer. Two salting patterns fix this at the plan level:

- salted aggregation: split each key into SALT sub-keys for the first
  (parallel) phase, then combine the partials — two small shuffles
  instead of one hot one.
- salted join: give every FACT row a random salt in [0, SALT) and
  replicate the (small but not broadcastable) build side once per salt
  value, joining on (key, salt) — a hot key's rows now spread over SALT
  reducers instead of one.

Results are identical to the unsalted plan, which is exactly what the
oracles check.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..queries.registry import register
from ..session import ensure_analytics_conf

SALT = 16


def salted_group_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_cols: tuple[str, ...] = (),
) -> DataFrame:
    """count/sum/avg per key via salt → partial agg → final agg.

    The salt must be a per-ROW source (here: a hash over row content
    columns), never a function of the group key alone — salting by the
    key would give every row of a hot key the same salt and change
    nothing. The final result is salt-invariant, which is what the
    oracle checks.
    """
    salt_src = (
        F.concat_ws("|", *[F.col(c).cast("string") for c in salt_cols])
        if salt_cols
        else F.monotonically_increasing_id().cast("string")
    )
    salted = df.withColumn("_salt", (F.crc32(salt_src) % SALT).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        F.count("*").alias("_cnt"),
        F.sum(F.round(F.col(value) * 100).cast("bigint")).alias("_sum_cents"),
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("cnt"),
        (F.sum("_sum_cents") / 100.0).alias("sum_value"),
        F.round(
            (F.sum("_sum_cents") / 100.0) / F.sum("_cnt").cast("double"), 6
        ).alias("avg_value"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_cols: tuple[str, ...],
    n_salt: int = SALT,
) -> DataFrame:
    """Skew-resistant equi-join: per-row salt on the fact side, ×n_salt
    replication of the dim side, equi-join on (key, salt).

    The dim side must be small enough to replicate n_salt× through one
    shuffle but (in the motivating scenario) too large or too dynamic to
    broadcast — the classic mid-size-dimension case AQE's skew handling
    does not cover. The ``merge`` hint pins a sort-merge join so the demo
    (and its plan test) exercises the salted shuffle path rather than
    being silently broadcast away at test scale. Row multiplicity is
    preserved exactly: each fact row carries ONE salt value and meets each
    matching dim row exactly once (the replica with its salt).
    """
    salt_src = F.concat_ws("|", *[F.col(c).cast("string") for c in salt_cols])
    f = fact.withColumn("_salt", (F.crc32(salt_src) % n_salt).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return f.join(d.hint("merge"), on=[key, "_salt"]).drop("_salt")


@register(
    "sk_salted_join",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS cnt,
           SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 100.0
               AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("skew", "join"),
)
def sk_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join (customer × nation on the 25-value — maximally
    hot — nation key), aggregated per nation; the oracle is the plain
    unsalted join, proving the rewrite is lossless."""
    ensure_analytics_conf(spark)
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), "c_custkey", "c_acctbal"
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_name"
    )
    joined = salted_join(
        c, n, "nationkey", salt_cols=("c_custkey", "c_acctbal")
    )
    return joined.groupBy("n_name").agg(
        F.count("*").alias("cnt"),
        (F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint")) / 100.0).alias(
            "total_acctbal"
        ),
    )


@register(
    "sk_salted_group_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS cnt,
           SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_value,
           ROUND(
               (SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0)
                   / COUNT(*)::DOUBLE,
               6
           ) AS avg_value
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("skew", "agg"),
)
def sk_salted_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation on a 3-value (maximally hot) key — the oracle is
    the plain single-shuffle aggregation, proving result equivalence."""
    ensure_analytics_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return salted_group_agg(
        li,
        "l_returnflag",
        "l_quantity",
        salt_cols=("l_orderkey", "l_partkey", "l_linenumber", "l_quantity"),
    )


# --- runtime bloom-filter semi-join reduction --------------------------------

_BLOOM_CONFS = {
    # At 100 TB the lineitem scan is far past the 10 GiB default, so the
    # optimizer injects the filter on its own; locally the scan is tiny and
    # the threshold must be dropped to observe the same plan.
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # The filtered orders side must count as "cheap to pre-aggregate".
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "500MB",
    # Bloom filters target SHUFFLE joins: on a cluster the orders side is
    # nowhere near broadcastable, so the real plan is a shuffle join.
    # Locally everything broadcasts, which suppresses injection — disable
    # broadcast while the logical plan is optimized to reproduce the
    # cluster-shaped plan. (AQE may still convert the join to broadcast at
    # runtime; the injected bloom subquery survives that conversion.)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@register(
    "sk_bloom_prune_join",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
    tags=("join", "bloom", "runtime-filter"),
)
def sk_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join with Spark's runtime bloom-filter semi-join reduction.

    The selective filter on orders (1 of 5 priorities) means ~80% of
    lineitem rows can never find a match — but a plain shuffle join still
    shuffles all of them. Spark's `InjectRuntimeFilter` rule builds a
    bloom filter over the filtered orders keys (`bloom_filter_agg`) and
    pushes a `BloomFilterMightContain` predicate into the lineitem scan,
    so non-matching rows die before the exchange. This is the single
    biggest shuffle-volume lever for selective fact⋈fact joins at 100 TB;
    pruning is probabilistic (false positives pass, false negatives
    impossible) so the join result — and the oracle comparison — is exact.

    The builder pins the optimized plan while cluster-realistic thresholds
    are in force, then restores the session confs so no other query's
    plan is affected; `tests/test_plans.py` asserts the bloom filter is
    actually present.
    """
    ensure_analytics_conf(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    saved = {k: spark.conf.get(k) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        df = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias("cnt"),
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                ).alias("revenue_cents"),
            )
        )
        # Force logical optimization NOW (plan is cached on the
        # QueryExecution) so the bloom injection happens under the pinned
        # confs, not whenever the caller first runs an action.
        df._jdf.queryExecution().optimizedPlan()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    return df


# --- hot-key diagnostic report ------------------------------------------------

HOT_TOP = 10  # keys reported


@register(
    "sk_hot_keys",
    oracle=f"""
    WITH c AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ),
    t AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM c),
    r AS (
        SELECT user_id, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rk
        FROM c
    )
    SELECT r.rk, r.user_id, r.cnt,
           CAST((1000 * r.cnt) // (SELECT total FROM t) AS BIGINT)
               AS share_milli,
           CAST((1000 * SUM(r.cnt) OVER (ORDER BY r.rk))
                // (SELECT total FROM t) AS BIGINT) AS cum_share_milli,
           (SELECT n_keys FROM t) AS n_keys
    FROM r WHERE r.rk <= {HOT_TOP}
    ORDER BY r.rk
    """,
    tags=("skew", "diagnostics"),
)
def sk_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key report for the events.user_id shuffle key: the top-{10}
    keys with per-key and cumulative share (integer milli), plus total
    key cardinality — the diagnostic a pipeline owner runs BEFORE
    choosing between plain, salted, and AQE-skew plans (on the round-6
    Zipf variant the top row reads ~160 milli = one user owning 16% of
    the fact table; on uniform data ~1 milli). Complements the sk_*
    mitigation operators the way EXPLAIN complements a hint.

    Plan shape (100 TB): one map-side-combined count per key (the only
    pass over the fact), then ranking over the |keys| relation and a
    1-row broadcast total (scalar-subquery pattern). The report is
    top-N-bounded output; nothing key-cardinality-sized leaves the
    aggregation.
    """
    ensure_analytics_conf(spark)
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    t = c.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_keys")
    )
    r = c.select(
        "user_id",
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("user_id")))
        .cast("long")
        .alias("rk"),
    ).filter(F.col("rk") <= HOT_TOP)
    cum = (
        Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        r.crossJoin(F.broadcast(t))
        .select(
            "rk",
            "user_id",
            "cnt",
            F.expr("CAST((1000 * cnt) DIV total AS BIGINT)").alias(
                "share_milli"
            ),
            F.expr(
                "CAST((1000 * SUM(cnt) OVER (ORDER BY rk)) DIV total AS BIGINT)"
            ).alias("cum_share_milli"),
            "n_keys",
        )
        .orderBy("rk")
    )


@register(
    "sk_gini_activity",
    oracle="""
    WITH c AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ),
    r AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS i FROM c
    ),
    s AS (
        SELECT COUNT(*) AS n, CAST(SUM(cnt) AS BIGINT) AS tot,
               CAST(SUM(i * cnt) AS BIGINT) AS sic
        FROM r
    )
    SELECT n AS n_keys, tot AS total_events,
           ROUND((2 * sic - (n + 1) * tot)::DOUBLE / (n * tot)::DOUBLE, 6)
               AS gini
    FROM s
    """,
    tags=("skew", "diagnostics"),
)
def sk_gini_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of events-per-user — the single-number key-
    concentration metric that pairs with sk_hot_keys' top-N table
    (uniform keys → ~0; the round-6 Zipf variant → high). Computed by the
    exact rank formula G = (2·Σ i·cᵢ − (n+1)·Σ cᵢ) / (n·Σ cᵢ) over counts
    sorted ascending with a user_id tie-break, so the whole statistic is
    three integer sums and one final double division — identical on both
    engines, no float accumulation anywhere.

    Plan shape (100 TB): one map-side-combined per-key count, one ranking
    sort over the |keys| relation (the same total order sk_hot_keys
    already prices), three integer aggregates, 1-row output.
    """
    ensure_analytics_conf(spark)
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    r = c.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.asc("cnt"), F.asc("user_id")))
        .cast("long")
        .alias("i"),
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("tot"),
        F.sum(F.col("i") * F.col("cnt")).alias("sic"),
    )
    return s.select(
        F.col("n").alias("n_keys"),
        F.col("tot").alias("total_events"),
        F.round(
            (2 * F.col("sic") - (F.col("n") + 1) * F.col("tot")).cast("double")
            / (F.col("n") * F.col("tot")).cast("double"),
            6,
        ).alias("gini"),
    )


# --- hot-key isolation (two-path split join) -----------------------------------

HOT_KEY_TOPN = 5  # the N heaviest fact keys take the broadcast path


@register(
    "sk_hot_key_split_join",
    oracle="""
    SELECT s.s_name,
           COUNT(*) AS cnt,
           SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY s.s_name
    """,
    tags=("skew", "join", "hot-key-isolation"),
)
def sk_hot_key_split_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-path skew join (hot-key isolation): the HOT_KEY_TOPN heaviest
    fact keys (by a key-stats pass; ties to the smaller key) take a
    BROADCAST path — the dim rows for hot keys are, by construction, at
    most |hot keys| — everything else takes the normal shuffle path; the
    union aggregates per supplier. The oracle is the plain join, proving
    the split lossless. Top-N (rather than an absolute count threshold)
    keeps the hot set constant-sized at ANY scale factor and exercises
    both paths even on uniform test data; production would set N from the
    stats pass (keys above p99.9 × mean, capped).

    This is the production alternative to salting when skew is
    CONCENTRATED: salting (sk_salted_join) spreads every key's rows
    n_salt ways, paying replication on the whole dim; isolation pays
    broadcast only for the handful of hot keys and leaves the cold path's
    shuffle untouched — no reducer ever sees a hot key's full row set.
    AQE's skew-join split does this adaptively at runtime; the explicit
    form works on any join the optimizer can't re-plan (e.g. under a
    required output partitioning) and documents the key-stats pass.

    Plan shape (100 TB): the stats pass is one map-side-combined count on
    the fact's join key (key-cardinality-sized result); hot keys come
    back as a constant-sized driver list (bounded by |fact| /
    HOT_KEY_MIN_CNT); the hot fact slice joins broadcast, the cold slice
    sort-merge/shuffle joins with the hot keys FILTERED OUT of both
    sides before the exchange.
    """
    ensure_analytics_conf(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    key_counts = li.groupBy("l_suppkey").agg(F.count("*").alias("kcnt"))
    hot_keys = [
        r["l_suppkey"]
        for r in key_counts.orderBy(
            F.desc("kcnt"), F.asc("l_suppkey")
        ).limit(HOT_KEY_TOPN).collect()
    ]

    if hot_keys:
        hot_fact = li.filter(F.col("l_suppkey").isin(hot_keys))
        hot_dim = sup.filter(F.col("s_suppkey").isin(hot_keys))
        cold_fact = li.filter(~F.col("l_suppkey").isin(hot_keys))
        cold_dim = sup.filter(~F.col("s_suppkey").isin(hot_keys))
        joined = hot_fact.join(
            F.broadcast(hot_dim),
            F.col("l_suppkey") == F.col("s_suppkey"),
        ).unionByName(
            cold_fact.join(
                cold_dim.hint("merge"),
                F.col("l_suppkey") == F.col("s_suppkey"),
            )
        )
    else:
        joined = li.join(
            sup.hint("merge"), F.col("l_suppkey") == F.col("s_suppkey")
        )

    return (
        joined.groupBy("s_name")
        .agg(
            F.count("*").alias("cnt"),
            (
                F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
                / 100.0
            ).alias("sum_qty"),
        )
        .orderBy("s_name")
    )


# --- join-key skew profile -----------------------------------------------------------


@register(
    "sk_join_key_skew_profile",
    oracle="""
    WITH c AS (
        SELECT o_custkey AS k, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, k) AS rn FROM c
    ),
    t AS (SELECT COUNT(*) AS nk, CAST(SUM(cnt) AS BIGINT) AS n FROM c)
    SELECT t.nk AS n_keys,
           t.n AS n_rows,
           (SELECT MAX(cnt) FROM c) AS max_cnt,
           (SELECT cnt FROM r WHERE rn = (t.nk + 1) // 2) AS p50_cnt,
           (SELECT cnt FROM r WHERE rn = (99 * t.nk + 99) // 100) AS p99_cnt,
           ((SELECT MAX(cnt) FROM c) * 1000000) // (t.n // t.nk)
               AS max_over_mean_ppm,
           ((SELECT MAX(cnt) FROM c) * 1000000) // t.n AS top1_share_ppm
    FROM t
    """,
    tags=("skew", "diagnostics", "join-planning"),
)
def sk_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew profile of a join key (orders.o_custkey): key count, row
    count, the hottest key's row count, exact p50/p99 per-key counts,
    and two planning ratios — max/mean and the top key's share. This is
    the number the salting/AQE decisions in this family key off: a
    max_over_mean_ppm in the tens of millions says the unsalted shuffle
    will strand one reducer with the hub key (the zipf variant's
    customer distribution is exactly that).

    Exactness: percentiles are RANK-PICKED rows ((n+1)//2, (99n+99)//100
    — the standing cross-engine rule, never interpolated) over the
    per-key count relation; ratios use the truncating DIV pair.

    Plan shape (100 TB): the per-key count aggregation is the only
    corpus-scaled step (map-side combined); the rank window then runs
    over the |keys| relation — already the reduced cardinality a skew
    diagnostic inspects, and orders of magnitude smaller than the fact.
    The profile itself is how a pipeline DECIDES whether the downstream
    join needs salting before paying for it.
    """
    ensure_analytics_conf(spark)
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("cnt")
    )
    from pyspark.sql import Window

    r = c.withColumn(
        "rn", F.row_number().over(Window.orderBy("cnt", "k")).cast("long")
    )
    t = c.agg(
        F.count("*").cast("long").alias("nk"),
        F.sum("cnt").cast("long").alias("n"),
        F.max("cnt").alias("max_cnt"),
    ).first()
    nk, n, max_cnt = int(t["nk"]), int(t["n"]), int(t["max_cnt"])
    p50 = r.filter(F.col("rn") == (nk + 1) // 2).select("cnt").first()[0]
    p99 = (
        r.filter(F.col("rn") == (99 * nk + 99) // 100).select("cnt").first()[0]
    )
    return spark.range(1).select(
        F.lit(nk).cast("long").alias("n_keys"),
        F.lit(n).cast("long").alias("n_rows"),
        F.lit(max_cnt).cast("long").alias("max_cnt"),
        F.lit(int(p50)).cast("long").alias("p50_cnt"),
        F.lit(int(p99)).cast("long").alias("p99_cnt"),
        F.lit(max_cnt * 1_000_000 // (n // nk)).cast("long").alias(
            "max_over_mean_ppm"
        ),
        F.lit(max_cnt * 1_000_000 // n).cast("long").alias("top1_share_ppm"),
    )


# --- salt-factor planning ------------------------------------------------------------

SALT_PLAN_TOP = 20


@register(
    "sk_salt_plan",
    oracle="""
    WITH c AS (
        SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ),
    r AS (
        SELECT k, cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt, k) AS BIGINT) AS rn
        FROM c
    ),
    st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nk, CAST(SUM(cnt) AS BIGINT) AS n
        FROM c
    ),
    p AS (
        SELECT r.cnt AS p95 FROM r, st WHERE r.rn = (95 * st.nk + 95) // 100
    )
    SELECT k, cnt,
           CAST((cnt + p.p95 - 1) // p.p95 AS BIGINT) AS salt_factor,
           CAST(cnt * 1000000 // st.n AS BIGINT) AS share_ppm
    FROM c, p, st
    WHERE (cnt + p.p95 - 1) // p.p95 >= 2
    ORDER BY cnt DESC, k
    LIMIT 20
    """,
    tags=("skew", "salting", "planning"),
)
def sk_salt_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable output of skew diagnosis: per-hot-key salt factors.
    A key's factor is ceil(count / p95-count) — enough splits that each
    salted sub-key carries no more than a healthy (95th-percentile) key's
    load — reported for every key needing factor ≥ 2, hottest first.
    sk_join_key_skew_profile DETECTS the skew; this emits the plan a
    salted repartition (sk_salted_join's mechanism) would consume.

    Exactness: p95 is a RANK-PICKED per-key count ((95n+95)//100, the
    standing rule — never interpolated); factors and shares are exact
    integer ceil-DIV / ppm arithmetic.

    Plan shape (100 TB): one map-side-combined per-key count (the only
    fact-sized shuffle); ranking and thresholding run over the |keys|
    relation. The p95 scalar and totals ride 1-row cross joins. On the
    zipf variant the hub user (~9% of all events) gets the large factor
    this op exists to emit.
    """
    ensure_analytics_conf(spark)
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    from pyspark.sql import Window

    r = c.withColumn(
        "rn", F.row_number().over(Window.orderBy("cnt", "k")).cast("long")
    )
    st = c.agg(
        F.count("*").cast("long").alias("nk"),
        F.sum("cnt").cast("long").alias("n"),
    )
    p95 = r.join(
        F.broadcast(st), F.expr("rn = (95 * nk + 95) DIV 100")
    ).select(F.col("cnt").alias("p95"))
    return (
        c.crossJoin(F.broadcast(p95))
        .crossJoin(F.broadcast(st.select("n")))
        .filter(F.expr("(cnt + p95 - 1) DIV p95 >= 2"))
        .select(
            "k",
            "cnt",
            F.expr("(cnt + p95 - 1) DIV p95").alias("salt_factor"),
            F.expr("cnt * 1000000 DIV n").alias("share_ppm"),
        )
        .orderBy(F.desc("cnt"), F.asc("k"))
        .limit(SALT_PLAN_TOP)
    )
