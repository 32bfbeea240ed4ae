"""Semantic guarantees of the fixed-point k-means (ss_kmeans) beyond the
value-level oracle: assignment self-consistency, determinism, and the
exactness of the integer distance arithmetic the whole design rests on."""

from __future__ import annotations

import pyspark.sql.functions as F

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators import (
    similarity as S,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
    registry,
)

SPECS = registry.all_specs()


def _final_state(spark, sf_dir):
    """Re-run the pipeline and return (assigned rows, final centroids)."""
    v = S._km_fixed_vectors(spark, sf_dir).localCheckpoint(eager=True)
    seeds = v.filter(F.col("vec_id") < S.KM_K).select("vec_id", "x").collect()
    cents = sorted((int(r["vec_id"]), [int(x) for x in r["x"]]) for r in seeds)
    for _ in range(S.KM_ITERS):
        cents = S._km_update(v, cents)
    rows = S._km_assign(v, cents).collect()
    return rows, cents


def test_assignment_is_argmin_of_final_centroids(spark, oracle_sf_dir):
    """Every vector's cluster is the true argmin (ties -> lowest id) over
    the final centroids, recomputed independently in pure Python ints."""
    rows, cents = _final_state(spark, oracle_sf_dir)
    assert rows, "no assignments produced"
    for r in rows[::7]:  # stride: full set is oracle-checked anyway
        x = [int(v) for v in r["x"]]
        dists = [
            (sum((xi - mi) * (xi - mi) for xi, mi in zip(x, m)), j)
            for j, m in cents
        ]
        best_d, best_j = min(dists)
        assert r["cluster"] == best_j, f"vec {r['vec_id']} not at argmin"
        assert r["dist_sq"] == best_d, f"vec {r['vec_id']} dist not exact"


def test_kmeans_is_deterministic_across_runs(spark, oracle_sf_dir):
    b = SPECS["ss_kmeans"].builder
    one = sorted(map(tuple, b(spark, oracle_sf_dir).collect()))
    two = sorted(map(tuple, b(spark, oracle_sf_dir).collect()))
    assert one == two


def test_semantic_dedup_nn_is_symmetric_member(spark, oracle_sf_dir):
    """nn_id must itself be a clustered vector of the SAME cluster, and
    never the vector itself."""
    df = SPECS["ss_semantic_dedup"].builder(spark, oracle_sf_dir)
    rows = df.collect()
    assert rows
    by_id = {r["vec_id"]: r["cluster"] for r in rows}
    for r in rows:
        assert r["nn_id"] != r["vec_id"]
        assert by_id.get(r["nn_id"]) == r["cluster"]


def test_pq_adc_approximates_exact_topk(spark, oracle_sf_dir):
    """PQ@8-codes-per-subspace is lossy by design, but on this corpus the
    ADC ranking must still recover a solid fraction of the exact top-10 —
    a quantization bug (wrong slice offsets, scrambled codes) drops recall
    to chance and fails this bound."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
        registry,
    )

    specs = registry.all_specs()
    exact = specs["ss_brute_topk"].builder(spark, oracle_sf_dir).collect()
    pq = specs["ss_pq_adc_topk"].builder(spark, oracle_sf_dir).collect()
    exact_sets: dict[int, set[int]] = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    pq_sets: dict[int, set[int]] = {}
    for r in pq:
        pq_sets.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    assert set(pq_sets) == set(exact_sets)
    recalls = [
        len(pq_sets[q] & exact_sets[q]) / len(exact_sets[q]) for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.4, f"mean recall collapsed: {recalls}"


def test_ann_recall_report_floor(spark, oracle_sf_dir):
    """Asserted minimum on ss_ann_recall_report (r5 verdict #6): the
    sign-LSH top-k currently measures mean 320 milli over the 5 query
    vectors at sf0.01 against exact brute force (chance level ~17 milli
    for k=10 of 600). A retune of LSH_BITS/probe depth that collapses
    recall toward chance fails here."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
        registry,
    )

    rows = (
        registry.all_specs()["ss_ann_recall_report"]
        .builder(spark, oracle_sf_dir)
        .collect()
    )
    assert rows, "no query vectors evaluated"
    mean_milli = sum(r["recall_milli"] for r in rows) / len(rows)
    assert mean_milli >= 200, (
        f"mean ANN recall {mean_milli}/1000 below the 0.2 floor - "
        "LSH parameters degraded toward chance"
    )
