"""The reference's 20 query templates, re-expressed on the driver tables.

The reference executes 20 SQL templates (``harvard_artifacts_app.py:289-313``)
against its artifact star schema. The driver's correctness gate runs on the
TPC-H-ish tables, so each template's *operator shape* is mapped onto the
equivalent star-schema relationship (FIXTURES.md §B):

    artifactmetadata (parent)  ≙ orders / customer
    artifactmedia   (1:1 child) ≙ lineitem (per-order lines)
    artifactcolors  (1:N child) ≙ lineitem / nation / region dims

Query ↔ reference citation is in each docstring. The same 20 shapes also run
on artifact-shaped fixtures in ``tests/test_artifact_queries.py``.

Determinism contract (see registry docstring): LIMIT ⇒ total order with a
unique key; double SUM ⇒ exact integer-cents arithmetic; AVG ⇒ round(…, 6).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..session import ensure_analytics_conf
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_analytics_conf(spark)
    return load_table(spark, sf_dir, name)


def _sum_cents(col: str | F.Column, alias: str) -> F.Column:
    """Order-independent SUM over a double column: exact bigint cents.

    IEEE double ops are bit-deterministic per row in both engines; the sum
    itself is integer, so partial-aggregation order cannot change the result.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(F.round(c * F.lit(100)).cast("bigint")) / F.lit(100.0)
    ).alias(alias)


def _avg6(col: str | F.Column, alias: str) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.avg(c), 6).alias(alias)


# --- Q1: conjunctive equality filter (reference :290) -----------------------


@register(
    "rq01_conj_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus = 'F'
    """,
    tags=("reference", "filter"),
)
def rq01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → conjunctive equality filter (ref Q1, harvard_artifacts_app.py:290)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")


# --- Q2: DISTINCT with null/empty filter (:291) -----------------------------


@register(
    "rq02_distinct_filtered",
    oracle="""
    SELECT DISTINCT c_mktsegment
    FROM customer
    WHERE c_mktsegment IS NOT NULL AND c_mktsegment != ''
    """,
    tags=("reference", "distinct"),
)
def rq02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter (null + empty string) → project → distinct (ref Q2, :291)."""
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment").isNotNull() & (F.col("c_mktsegment") != ""))
        .select("c_mktsegment")
        .distinct()
    )


# --- Q3: LIKE substring filter (:292) ---------------------------------------


@register(
    "rq03_like_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%widget%'
    """,
    tags=("reference", "filter"),
)
def rq03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-pattern filter, LIKE '%x%' (ref Q3, :292)."""
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_name", "p_type"
    )


# --- Q4: ORDER BY DESC + LIMIT = top-k (:293) -------------------------------


@register(
    "rq04_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice IS NOT NULL
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("reference", "topk"),
)
def rq04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project → filter → top-k; Spark plans TakeOrderedAndProject (ref Q4, :293)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice").isNotNull())
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# --- Q5: GROUP BY count (:294) ----------------------------------------------


@register(
    "rq05_group_count",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("reference", "agg"),
)
def rq05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with COUNT(*) (ref Q5, :294)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))


# --- Q6: join + scalar filter + limit (:295) --------------------------------


@register(
    "rq06_join_filter_topk",
    oracle="""
    SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_quantity > 45
    ORDER BY o.o_orderkey, l.l_linenumber, o.o_orderpriority, l.l_quantity
    LIMIT 20
    """,
    tags=("reference", "join"),
)
def rq06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join → `>` filter → project → limit (ref Q6, :295).

    The reference's bare LIMIT is nondeterministic; we add a total order so
    the oracle comparison is exact.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_quantity") > 45)
        .select("o_orderkey", "o_orderpriority", "l_linenumber", "l_quantity")
        .orderBy("o_orderkey", "l_linenumber", "o_orderpriority", "l_quantity")
        .limit(20)
    )


# --- Q7: ungrouped AVG (:296) ------------------------------------------------


@register(
    "rq07_global_avg",
    oracle="""
    SELECT ROUND(AVG(l_discount), 6) AS avg_discount
    FROM lineitem
    WHERE l_discount IS NOT NULL
    """,
    tags=("reference", "agg"),
)
def rq07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (ungrouped) aggregate AVG (ref Q7, :296 — AVG(`rank`))."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_discount").isNotNull()).agg(
        _avg6("l_discount", "avg_discount")
    )


# --- Q8: column-vs-column predicate after join (:297) ------------------------


@register(
    "rq08_col_vs_col",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_tax, l.l_discount
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_tax > l.l_discount
    ORDER BY o.o_orderkey, l.l_linenumber, l.l_tax, l.l_discount
    LIMIT 20
    """,
    tags=("reference", "join", "filter"),
)
def rq08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join → column-vs-column comparison → limit (ref Q8, :297)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_tax") > F.col("l_discount"))
        .select("o_orderkey", "l_linenumber", "l_tax", "l_discount")
        .orderBy("o_orderkey", "l_linenumber", "l_tax", "l_discount")
        .limit(20)
    )


# --- Q9: BETWEEN range predicate after join (:298) ---------------------------


@register(
    "rq09_between",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber, l.l_quantity
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    ORDER BY o.o_orderkey, l.l_linenumber, l.l_quantity, o.o_orderdate
    LIMIT 20
    """,
    tags=("reference", "join", "filter"),
)
def rq09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join → BETWEEN range predicate → limit (ref Q9, :298)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("o_orderdate").between("1996-01-01", "1996-12-31"))
        .select("o_orderkey", "o_orderdate", "l_linenumber", "l_quantity")
        .orderBy("o_orderkey", "l_linenumber", "l_quantity", "o_orderdate")
        .limit(20)
    )


# --- Q10: COUNT(*) under equality filter (:299) ------------------------------


@register(
    "rq10_count_filter",
    oracle="SELECT COUNT(*) AS cnt FROM lineitem WHERE l_linenumber = 1",
    tags=("reference", "agg"),
)
def rq10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → global count (ref Q10, :299 — mediacount = 0)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linenumber") == 1).agg(F.count("*").alias("cnt"))


# --- Q11: DISTINCT under null filter (:300) ----------------------------------


@register(
    "rq11_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag
    FROM lineitem
    WHERE l_returnflag IS NOT NULL
    """,
    tags=("reference", "distinct"),
)
def rq11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null filter → distinct (ref Q11, :300)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag").isNotNull()).select("l_returnflag").distinct()


# --- Q12: top-k over an aggregate (:301) -------------------------------------


@register(
    "rq12_topk_over_agg",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS frequency
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY frequency DESC, l_suppkey
    LIMIT 5
    """,
    tags=("reference", "agg", "topk"),
)
def rq12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-agg → sort on the aggregate → limit (ref Q12, :301)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("frequency"))
        .orderBy(F.desc("frequency"), F.asc("l_suppkey"))
        .limit(5)
    )


# --- Q13: grouped AVG under filter (:302) ------------------------------------


@register(
    "rq13_group_avg",
    oracle="""
    SELECT l_returnflag, ROUND(AVG(l_discount), 6) AS avg_discount
    FROM lineitem
    WHERE l_returnflag IS NOT NULL
    GROUP BY l_returnflag
    """,
    tags=("reference", "agg"),
)
def rq13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → group-agg AVG (ref Q13, :302)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag").isNotNull())
        .groupBy("l_returnflag")
        .agg(_avg6("l_discount", "avg_discount"))
    )


# --- Q14/Q18: join + null filter, full result (:303,:307) ---------------------


@register(
    "rq14_join_nullfilter",
    oracle="""
    SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus IS NOT NULL
    """,
    tags=("reference", "join"),
)
def rq14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join → IS NOT NULL filter, no limit (ref Q14, :303)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("o_orderstatus").isNotNull())
        .select("o_orderkey", "o_orderpriority", "l_linenumber")
    )


# --- Q15: bare COUNT(*) (:304) ------------------------------------------------


@register(
    "rq15_count_star",
    oracle="SELECT COUNT(*) AS total_rows FROM lineitem",
    tags=("reference", "agg"),
)
def rq15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare global count (ref Q15, :304)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(F.count("*").alias("total_rows"))


# --- Q16: dim join + equality filter + limit (:305) ---------------------------


@register(
    "rq16_dim_join_topk",
    oracle="""
    SELECT c.c_name, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    ORDER BY c.c_name
    LIMIT 20
    """,
    tags=("reference", "join", "topk"),
)
def rq16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:N join to a dimension → equality filter → limit (ref Q16, :305).

    nation is tiny → Catalyst broadcasts it (no shuffle of customer).
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .filter(F.col("n_name") == "NATION_3")
        .select("c_name", "n_name")
        .orderBy("c_name")
        .limit(20)
    )


# --- Q17: join + full global sort, no limit (:306) ----------------------------


@register(
    "rq17_join_sort",
    oracle="""
    SELECT c.c_name, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ORDER BY c.c_name
    """,
    tags=("reference", "join", "sort"),
)
def rq17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join → full sort with no limit → range-partitioned sort (ref Q17, :306)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_name", "n_name")
        .orderBy("c_name")
    )


# --- Q18: Q14 with qualified/reserved-word columns (:307) ----------------------


@register(
    "rq18_join_reserved_word",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus AS "order", l.l_linenumber AS "rank"
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority IS NOT NULL
    """,
    tags=("reference", "join"),
)
def rq18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join projecting columns named by SQL reserved words (ref Q18, :307).

    The reference backtick-quotes `rank` (:78, :296); here we prove the Spark
    side round-trips reserved-word column names (`order`, `rank`).
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("o_orderpriority").isNotNull())
        .select(
            F.col("o_orderkey"),
            F.col("o_orderstatus").alias("order"),
            F.col("l_linenumber").alias("rank"),
        )
    )


# --- Q19: 3-way star join + conjunctive filter + DISTINCT (:308-311) ----------


@register(
    "rq19_three_way_join",
    oracle="""
    SELECT DISTINCT c.c_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND c.c_acctbal <= 5000
    """,
    tags=("reference", "join", "distinct"),
)
def rq19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way star join → `=` + `<=` filters → DISTINCT (ref Q19, :308-311).

    Both dims broadcast; the fact table never shuffles for the join.
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter((F.col("r_name") == "ASIA") & (F.col("c_acctbal") <= 5000))
        .select("c_name")
        .distinct()
    )


# --- Q20: join + multi-aggregate + top-k (:312) --------------------------------


@register(
    "rq20_join_agg_topk",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS order_count,
           ROUND(AVG(l.l_quantity), 6) AS avg_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY order_count DESC, o.o_orderpriority
    LIMIT 10
    """,
    tags=("reference", "join", "agg", "topk"),
)
def rq20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join → group-agg with two aggregates → top-k (ref Q20, :312)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"), _avg6("l_quantity", "avg_qty"))
        .orderBy(F.desc("order_count"), F.asc("o_orderpriority"))
        .limit(10)
    )


# --- Flagship: pricing-summary scan-heavy aggregate ----------------------------


@register(
    "flagship_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
           SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 100.0
               AS sum_disc_price,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("reference", "agg", "flagship"),
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy grouped aggregate (TPC-H Q1 shape).

    Exercises in one plan everything the reference's query set leans on:
    pushed-down scan filter, whole-stage-codegen expression evaluation,
    partial (map-side) aggregation, tiny shuffle, sort. The double SUMs use
    exact integer-cents arithmetic so results are bit-stable regardless of
    partitioning — at 100 TB the only shuffle here is |groups| rows.
    """
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-12-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum_cents("l_quantity", "sum_qty"),
            _sum_cents("l_extendedprice", "sum_base_price"),
            _sum_cents(disc_price, "sum_disc_price"),
            _avg6("l_quantity", "avg_qty"),
            _avg6("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "rq20_preagg_variant",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS order_count,
           ROUND(AVG(l.l_quantity), 6) AS avg_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY order_count DESC, o.o_orderpriority
    LIMIT 10
    """,
    tags=("reference", "join", "agg", "topk", "scale-rewrite"),
)
def rq20_preagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rq20 with the 100-TB shuffle-reduction rewrite, same oracle.

    Partial-aggregate lineitem per orderkey BEFORE the join: the join
    input shrinks from one row per lineitem to one row per order (~4×
    here), so a sort-merge join at scale shuffles a fraction of the
    bytes. The grouped AVG is recovered exactly as sum(qty)/sum(n) —
    l_quantity is integral, so the partial sums are exact in double and
    the single final division matches AVG bit-for-bit after rounding.
    Catalyst cannot derive this rewrite itself (it changes the agg tree);
    value-equality against the UNREWRITTEN oracle proves it lossless.
    """
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_li"), F.sum("l_quantity").alias("qty_sum")
    )
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_li").alias("order_count"),
            F.round(F.sum("qty_sum") / F.sum("n_li"), 6).alias("avg_qty"),
        )
        .orderBy(F.desc("order_count"), F.asc("o_orderpriority"))
        .limit(10)
    )
