"""Oracle parity on the Zipf-skewed dataset variant.

The sf0.01 gate proves correctness on near-uniform keys; these cases
re-prove it where the skew paths actually bend — hub users/suppliers and
a boilerplate-heavy corpus (``scripts/make_scaled_data.py --zipf``).
Picked queries: the two round-6 skew diagnostics, the Zipf-fit
statistic, and the burst/gap operators whose integer-DIV fix must hold
on skewed series too. The text-dedup pair (naive vs PPJoin prefix) is
NOT oracled here — its DuckDB oracle is the brute-force all-pairs join,
quadratic at the 50k-doc zipf corpus — but their mutual equality under
skew is asserted Spark-side by scripts/skew_experiment.py (`lossless:
true`, recorded in SCALE.md).

Skips when the variant has not been generated (it is a build artifact
under var/, not committed).
"""

from __future__ import annotations

import os

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
    registry,
)

from .oracle_harness import run_case

ZIPF_DIR = os.environ.get("SPARK_GRAFT_ZIPF_DIR", "/root/repo/var/sf0.1-zipf")

ZIPF_CASES = [
    "sk_hot_keys",
    "sk_gini_activity",
    "tx_zipf_fit",
    "tw_burst_detection",
    "fx_id_gap_audit",
]


@pytest.mark.parametrize("name", ZIPF_CASES)
def test_zipf_parity(spark, name):
    if not os.path.isdir(ZIPF_DIR):
        pytest.skip(f"{ZIPF_DIR} not generated")
    spec = registry.all_specs()[name]
    errs = run_case(spark, ZIPF_DIR, name, spec.builder, spec.oracle)
    assert not errs, f"{name}@zipf: " + "; ".join(errs)
