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


def test_every_query_is_oracle_checked():
    """All 130+ registered queries carry a DuckDB oracle — the rows-only
    escape hatch (oracle=None) is intentionally unused. If a future query
    genuinely can't be SQL-expressed, drop this test and restore the
    parametrized rows-only runner it replaced (pre-round-5 history); until
    then an empty ROWS_ONLY_CASES is an invariant, not a skipped test."""
    assert ROWS_ONLY_CASES == []
