"""Skew-mitigation operators: salted two-phase aggregation.

AQE handles skewed *joins* automatically; skewed *aggregations* on a
low-cardinality or power-law key still funnel every row of a hot key
through one reducer. The salted pattern splits each key into SALT
sub-keys for the first (parallel) phase, then combines the partials — two
small shuffles instead of one hot one. Results are identical to the
plain aggregation, which is exactly what the oracle checks.
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
