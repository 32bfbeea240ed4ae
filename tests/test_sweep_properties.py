"""Property tests for the sweep/peeling rewrites added in round 5.

Both operators ship a scalable plan whose correctness rests on a
non-obvious rewrite (skyline: 2-d sweep over the distinct-x relation;
k-core: bounded-round peeling). The registered queries value-check them
against independent SQL formulations at sf0.01; these tests additionally
pin the rewrites on adversarial *small* inputs (ties in one or both
dimensions, chains, empty cores) where the parquet data happens to be
well-behaved.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _brute_skyline(points):
    """Definitional O(n²) skyline: minimize both coordinates."""
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (qx <= x and qy <= y and (qx < x or qy < y))
            for j, (qx, qy) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def _sweep_skyline(points):
    """The 2-d sweep the Spark plan implements, in plain Python: per
    distinct x the min y, a running min over ascending x, and the
    m1/m2 dominance test (m1 = min y at x' < x, m2 = min y at x' <= x)."""
    from collections import defaultdict

    per_x = defaultdict(lambda: float("inf"))
    for x, y in points:
        per_x[x] = min(per_x[x], y)
    xs = sorted(per_x)
    m2, m1 = {}, {}
    run = float("inf")
    for x in xs:
        m1[x] = run if run != float("inf") else None
        run = min(run, per_x[x])
        m2[x] = run
    out = [
        (x, y)
        for x, y in points
        if (m1[x] is None or m1[x] > y) and m2[x] >= y
    ]
    return sorted(out)


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=25,
    )
)
def test_skyline_sweep_equals_definition(points):
    """Duplicate points (mutually non-dominating) and one-dimension ties
    are exactly the cases the m1/m2 split exists for."""
    assert _sweep_skyline(points) == _brute_skyline(points)


def _brute_kcore(edges, k):
    """Definitional peeling on an adjacency map."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for u in [u for u, vs in adj.items() if len(vs) < k]:
            for v in adj[u]:
                adj[v].discard(u)
            del adj[u]
            changed = True
    return {u: len(vs) for u, vs in adj.items()}


def _round_kcore(edges, k, max_rounds=64):
    """The round-synchronous peel the Spark loop implements: drop ALL
    sub-k nodes simultaneously each round, to fixpoint."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    for _ in range(max_rounds):
        drop = {u for u, vs in adj.items() if len(vs) < k}
        if not drop:
            break
        for u in drop:
            for v in adj[u]:
                adj[v].discard(u)
            del adj[u]
    else:
        raise AssertionError("no fixpoint")
    return {u: len(vs) for u, vs in adj.items()}


@settings(max_examples=300, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=0,
        max_size=40,
    ),
    st.integers(1, 4),
)
def test_kcore_round_peel_equals_sequential_peel(edges, k):
    """Round-synchronous and one-at-a-time peeling reach the same core —
    the k-core is unique, so removal ORDER must not matter. Chains
    (max peel depth) and cliques (no peel) both arise at this size."""
    assert _round_kcore(edges, k) == _brute_kcore(edges, k)
