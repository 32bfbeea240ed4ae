"""Every registered oracle-checkable query must match DuckDB at sf0.01.

This is a local replica of the driver's t2 correctness gate.
"""

from __future__ import annotations

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
    registry,
)

from .oracle_harness import run_case

SPECS = registry.all_specs()
ORACLE_CASES = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_CASES = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_match(spark, oracle_sf_dir, name):
    spec = SPECS[name]
    errs = run_case(spark, oracle_sf_dir, name, spec.builder, spec.oracle)
    assert not errs, f"{name}: " + "; ".join(errs)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(spark, oracle_sf_dir, name):
    spec = SPECS[name]
    df = spec.builder(spark, oracle_sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
