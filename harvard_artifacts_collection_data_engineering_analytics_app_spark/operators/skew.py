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
