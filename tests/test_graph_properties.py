"""Property tests: iterative graph operators vs pure-Python replays.

gr_personalized_pagerank and gr_hits are exact fixed-point iterations;
here an independent Python model replays the identical integer
arithmetic over RANDOM small purchase graphs — seed customers missing
from the graph, single-supplier stars, disconnected components — the
shapes the fixed corpus never produces.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .conftest import slow_full

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.graph import (
    HITS_ROUNDS,
    HITS_SCALE,
    HITS_TOP,
    PPR_ROUNDS,
    PPR_SEED_CUSTKEYS,
    PPR_TOP,
    PR_SCALE,
    gr_hits,
    gr_personalized_pagerank,
)


@st.composite
def purchase_graph(draw):
    """orders (o_orderkey, o_custkey) + lineitem (l_orderkey, l_suppkey)
    with lineitems referencing real orders."""
    n_orders = draw(st.integers(min_value=1, max_value=10))
    orders = [
        (ok, draw(st.integers(min_value=1, max_value=5)))
        for ok in range(1, n_orders + 1)
    ]
    lineitem = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=n_orders),
                st.integers(min_value=1, max_value=4),
            ),
            min_size=1,
            max_size=25,
        )
    )
    return orders, lineitem


def _write(spark, path, orders, lineitem):
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")


def _weighted_edges(orders, lineitem):
    cust = dict(orders)
    w = defaultdict(int)
    for ok, sk in lineitem:
        if ok in cust:
            w[(cust[ok] * 2, sk * 2 + 1)] += 1
    return w


def _model_ppr(orders, lineitem):
    raw = _weighted_edges(orders, lineitem)
    edges = defaultdict(int)
    for (s, d), w in raw.items():
        edges[(s, d)] += w
        edges[(d, s)] += w
    deg = defaultdict(int)
    for (s, _), w in edges.items():
        deg[s] += w
    ns = len(PPR_SEED_CUSTKEYS)
    seeds = [2 * k for k in PPR_SEED_CUSTKEYS]
    base = (3 * PR_SCALE // 20) // ns
    p = {n: PR_SCALE // ns for n in seeds}
    for _ in range(PPR_ROUNDS):
        spread = defaultdict(int)
        for (s, d), w in edges.items():
            if s in p:
                spread[d] += (p[s] * w) // deg[s]
        nxt = defaultdict(int)
        for d, v in spread.items():
            nxt[d] += (85 * v) // 100
        for n in seeds:
            nxt[n] += base
        p = dict(nxt)
    ranked = sorted(p.items(), key=lambda kv: (-kv[1], kv[0]))[:PPR_TOP]
    return ranked


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(purchase_graph())
@slow_full  # heavy model replay; see conftest (VERDICT r15 #2)
def test_personalized_pagerank_matches_model(spark, tmp_path_factory, g):
    orders, lineitem = g
    path = str(tmp_path_factory.mktemp("ppr"))
    _write(spark, path, orders, lineitem)
    got = [
        (r["node"], r["p"])
        for r in gr_personalized_pagerank(spark, path).collect()
    ]
    assert got == _model_ppr(orders, lineitem)


def _model_hits(orders, lineitem):
    be = _weighted_edges(orders, lineitem)
    # undo the node-id encoding: be keys are (2c, 2s+1) — recover (c, s)
    edges = {((s - 0) // 2, (d - 1) // 2): w for (s, d), w in be.items()}
    h = {c: HITS_SCALE for c, _ in edges}
    a = {}
    for _ in range(HITS_ROUNDS):
        ar = defaultdict(int)
        for (c, s), w in edges.items():
            if c in h:
                ar[s] += h[c] * w
        m = max(1, max(ar.values()) // HITS_SCALE) if ar else 1
        a = {s: v // m for s, v in ar.items()}
        hr = defaultdict(int)
        for (c, s), w in edges.items():
            if s in a:
                hr[c] += a[s] * w
        m = max(1, max(hr.values()) // HITS_SCALE) if hr else 1
        h = {c: v // m for c, v in hr.items()}
    out = []
    for side, scores in (("authority", a), ("hub", h)):
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out.extend(
            (side, n, v, i + 1)
            for i, (n, v) in enumerate(ranked[:HITS_TOP])
        )
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(purchase_graph())
@slow_full  # heavy model replay; see conftest (VERDICT r15 #2)
def test_hits_matches_model(spark, tmp_path_factory, g):
    orders, lineitem = g
    path = str(tmp_path_factory.mktemp("hits"))
    _write(spark, path, orders, lineitem)
    got = [
        (r["side"], r["node"], r["score"], r["rnk"])
        for r in gr_hits(spark, path).collect()
    ]
    assert got == _model_hits(orders, lineitem)
