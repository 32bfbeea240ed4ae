"""Graph analytics over relations: exact fixed-point PageRank.

The graph is DERIVED from the warehouse — customers and suppliers are
nodes, co-occurrence in an order's lineitems is a (weighted, symmetric)
edge — so the operator is self-contained and oracle-checkable like every
other query. The dedup pair graph (operators/components.py) handles
connectivity; this adds centrality, the other classic iterative graph
workload.

Determinism across engines is the whole design: ranks live on a 1e12
fixed-point integer grid, every transfer is integer arithmetic
(p·w DIV W, 85·x DIV 100), so summation order cannot perturb a single
bit and the chained-CTE DuckDB oracle reproduces the iterations exactly
— same approach as ss_kmeans.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..queries.registry import register
from ..session import ensure_analytics_conf

PR_SCALE = 1_000_000_000_000  # 1e12 fixed-point rank grid
PR_ROUNDS = 3
PR_TOP = 20


def _pr_oracle() -> str:
    base = f"(3 * {PR_SCALE} // 20) // nn.n"  # floor(0.15 * SCALE) / n
    ctes = [
        """raw AS (
        SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst, COUNT(*) AS w
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_custkey * 2, l_suppkey * 2 + 1
    )""",
        """e AS (
        SELECT src, dst, w FROM raw
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM raw
    )""",
        "deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS W FROM e GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM deg)",
        f"p0 AS (SELECT src AS node, {PR_SCALE} // nn.n AS p FROM deg, nn)",
    ]
    for k in range(PR_ROUNDS):
        ctes.append(
            f"""p{k + 1} AS (
        SELECT e.dst AS node,
               CAST({base}
                    + (85 * SUM((p{k}.p * e.w) // deg.W)) // 100 AS BIGINT) AS p
        FROM e
        JOIN p{k} ON p{k}.node = e.src
        JOIN deg ON deg.src = e.src, nn
        GROUP BY e.dst, nn.n
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, p FROM p{PR_ROUNDS}
    ORDER BY p DESC, node LIMIT {PR_TOP}
    """
    )


@register(
    "gr_pagerank",
    oracle=_pr_oracle(),
    tags=("graph", "pagerank", "iterative"),
)
def gr_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 rounds) on the symmetric
    customer↔supplier co-purchase graph; returns the top-20 nodes.

    Plan shape (100 TB): the canonical distributed PageRank — the edge
    list (with out-degree attached) is built once and materialized
    (eager localCheckpoint; a cluster job would persist and co-partition
    edges and ranks by src so each round's join is shuffle-free on the
    edge side). Each round is one equi-join (ranks are |V|-sized, edges
    |E|-sized) plus one map-side-combined aggregation by dst; ranks are
    re-checkpointed per round to truncate lineage, exactly like the
    connected-components loop. No collect anywhere — rank state never
    leaves the cluster.

    Symmetrized edges mean no dangling nodes, so no mass-redistribution
    term is needed and the integer mass argument stays simple:
    p ≤ SCALE, w ≤ W ⇒ every product stays far below 2⁶³.
    """
    ensure_analytics_conf(spark)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # No materialization barrier here: both union branches project the
    # IDENTICAL aggregate subplan, so ReuseExchange computes the groupBy
    # shuffle once (verified — an eager checkpoint measured slower). The
    # SCALE.md signature-reuse rule applies when consumer projections
    # differ; here they do not.
    raw = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    rev = raw.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
    )
    e = raw.unionByName(rev)
    deg = e.groupBy("src").agg(F.sum("w").cast("long").alias("outw"))
    edges = e.join(deg, "src").localCheckpoint(eager=True)

    # Node count and initial ranks read the CHECKPOINTED edges — deriving
    # them from `deg` would re-run the whole orders⋈lineitem build once
    # more per reference (measured ~1 s each at sf0.1).
    n_nodes = edges.select(F.countDistinct("src")).collect()[0][0]
    base = (3 * PR_SCALE // 20) // n_nodes

    p = (
        edges.select("src")
        .distinct()
        .select("src", F.lit(PR_SCALE // n_nodes).cast("long").alias("p"))
    )
    for _ in range(PR_ROUNDS):
        # Qualified aliases keep the self-referential join resolvable, and
        # the out-degree column is 'outw' rather than the conventional 'W'
        # because Spark SQL name resolution is case-INSENSITIVE: `E.w`
        # would match both the edge weight and the degree column.
        ranks = p.select(F.col("src").alias("node"), "p").alias("P")
        p = (
            edges.alias("E")
            .join(ranks, F.col("E.src") == F.col("P.node"))
            .groupBy(F.col("E.dst").alias("nxt"))
            .agg(
                (
                    F.lit(base)
                    + F.expr("(85 * SUM((P.p * E.w) DIV E.outw)) DIV 100")
                )
                .cast("long")
                .alias("p")
            )
            .select(F.col("nxt").alias("src"), "p")
            .localCheckpoint(eager=True)
        )
    return (
        p.select(F.col("src").alias("node"), "p")
        .orderBy(F.desc("p"), F.asc("node"))
        .limit(PR_TOP)
    )
