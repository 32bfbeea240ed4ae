"""Connected-components operator: hand-built graphs with known answers."""

from __future__ import annotations

import pyspark.sql.functions as F

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.components import (
    connected_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in rows}


def test_triangle_and_chain(spark):
    # triangle {1,2,3}, chain 10-11-12-13 (diameter 3), pair {20,21}
    got = _cc(
        spark,
        [(1, 2), (2, 3), (1, 3), (11, 10), (12, 11), (13, 12), (20, 21)],
    )
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_long_chain_converges(spark):
    # path 0-1-2-...-9: worst-case diameter for label propagation
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_bridge_merges_two_cliques(spark):
    # two cliques joined by one bridge edge → single component
    clique_a = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
    clique_b = [(a, b) for a in (7, 8, 9) for b in (7, 8, 9) if a < b]
    got = _cc(spark, clique_a + clique_b + [(3, 7)])
    assert set(got.values()) == {1}
    assert len(got) == 6


def test_duplicate_and_reversed_edges_are_harmless(spark):
    got = _cc(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_cluster_keepers_consistent_with_components(spark, sf_dir):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.components import (
        dd_cluster_components,
        dd_cluster_keepers,
    )

    comp = dd_cluster_components(spark, sf_dir).toPandas()
    keep = dd_cluster_keepers(spark, sf_dir).toPandas()
    # every component's keeper is its min member and sizes add up
    if len(comp) == 0:
        assert len(keep) == 0
        return
    by_comp = comp.groupby("component_id")["doc_id"]
    expect = {c: (g.min(), len(g)) for c, g in by_comp}
    got = {
        r.component_id: (r.keeper_doc_id, r.n_members)
        for r in keep.itertuples()
    }
    assert got == expect
    assert all(r.n_to_drop == r.n_members - 1 for r in keep.itertuples())


def test_propagation_raises_instead_of_partial_labels(spark):
    """Explicit label-propagation with diameter > max_iter must raise, not
    silently return wrong labels."""
    import pytest

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(49)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=5, algorithm="label-propagation")


def test_default_api_falls_back_to_star_on_long_chain(spark):
    """50-node path through the DEFAULT API: propagation cannot converge in
    its capped rounds, so auto falls back to star contraction and still
    produces the right labels (VERDICT r4 #7)."""
    got = _cc(spark, [(i, i + 1) for i in range(49)], propagation_rounds=3)
    assert got == {i: 0 for i in range(50)}


def test_star_contraction_path_graph_olog2_rounds(spark):
    """50-node path (diameter 49): star contraction converges within 10
    rounds — label propagation would need ~49. max_iter=10 doubles as the
    round-count assertion (it raises if the bound is exceeded)."""
    edges = [(i, i + 1) for i in range(49)]
    got = _cc(spark, edges, algorithm="star", max_iter=10)
    assert got == {i: 0 for i in range(50)}


def test_star_contraction_matches_propagation(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        n_nodes = rng.randint(5, 40)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.randint(1, 60))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        assert _cc(spark, edges, algorithm="star") == _cc(
            spark, edges, max_iter=50
        ), f"trial {trial}: {sorted(edges)}"


def test_components_property_random_graphs(spark):
    """Property: spark CC == union-find on random graphs."""
    import random

    def union_find_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical label = min member id per root
        comp_of = {}
        for n in nodes:
            comp_of.setdefault(find(n), []).append(n)
        out = {}
        for members in comp_of.values():
            m = min(members)
            for n in members:
                out[n] = m
        return out

    rng = random.Random(42)
    for trial in range(3):
        n_nodes = rng.randint(5, 40)
        n_edges = rng.randint(1, 60)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        expect = union_find_components(edges, nodes)
        got = _cc(spark, edges)
        assert got == expect, f"trial {trial}: {sorted(edges)}"
