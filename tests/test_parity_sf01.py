"""Targeted sf0.1 parity spot-checks for queries whose sf0.01 parity once
masked a real divergence.

Round-5 advice found tw_rfm_segments computed its recency anchor over the
user_id<200 cohort while the oracle scans all events — identical at sf0.01
(150 users total) and wrong at sf0.1 (1499 users). The standing sf0.01 gate
can't see that class of bug, so the queries it bit run here against the
bigger scale factor too. Keep this list short (each case is ~10x the sf0.01
cost); add a query only when a scale-dependent parity bug is found in it.
"""

from __future__ import annotations

import os

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
    registry,
)

from .oracle_harness import run_case

SF01_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SCALE_SENSITIVE = [
    "tw_rfm_segments",  # recency anchor: corpus max vs cohort max (r5 advice)
    "fx_incremental_agg_refresh",  # stored-MV staleness keyed on content now
]


@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_sf01_parity(spark, name):
    if not os.path.isdir(SF01_DIR):
        pytest.skip(f"{SF01_DIR} not present")
    spec = registry.all_specs()[name]
    errs = run_case(spark, SF01_DIR, name, spec.builder, spec.oracle)
    assert not errs, f"{name}@sf0.1: " + "; ".join(errs)
