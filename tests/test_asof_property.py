"""Property test: asof_join vs a pure-Python reference model."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.asof import (
    asof_join,
)

EPOCH = dt.datetime(2024, 1, 1)

ts_strategy = st.integers(min_value=0, max_value=10_000).map(
    lambda s: EPOCH + dt.timedelta(seconds=s)
)
key_strategy = st.integers(min_value=0, max_value=3)


@st.composite
def tables(draw):
    left = draw(
        st.lists(
            st.tuples(key_strategy, ts_strategy), min_size=1, max_size=15, unique=True
        )
    )
    right = draw(
        st.lists(
            st.tuples(key_strategy, ts_strategy), min_size=0, max_size=15, unique=True
        )
    )
    return left, right


def model_asof(left, right):
    """most recent right row with right.ts <= left.ts per key; ties on ts
    break toward the largest rid (mirrors tie_break=rid ascending + last)."""
    out = {}
    for i, (k, ts) in enumerate(left):
        best = None
        for j, (rk, rts) in enumerate(right):
            if rk == k and rts <= ts:
                if best is None or rts > best[0] or (rts == best[0] and j > best[1]):
                    best = (rts, j)
        out[i] = None if best is None else best[1]
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tables())
def test_asof_matches_model(spark, data):
    left, right = data
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(j, k, ts) for j, (k, ts) in enumerate(right)],
        "rid long, k long, rts timestamp",
    ) if right else spark.createDataFrame([], "rid long, k long, rts timestamp")

    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="rts",
            right_payload=("rid",), tie_break="rid",
        ).collect()
    }
    want = model_asof(left, right)
    assert got == want


def model_asof_forward(left, right):
    """earliest right row with right.ts >= left.ts per key; ties on ts
    break toward the smallest rid (tie_break=rid descending + last)."""
    out = {}
    for i, (k, ts) in enumerate(left):
        best = None
        for j, (rk, rts) in enumerate(right):
            if rk == k and rts >= ts:
                if best is None or rts < best[0] or (rts == best[0] and j < best[1]):
                    best = (rts, j)
        out[i] = None if best is None else best[1]
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tables())
def test_asof_forward_matches_model(spark, data):
    left, right = data
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(left)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(j, k, ts) for j, (k, ts) in enumerate(right)],
        "rid long, k long, rts timestamp",
    ) if right else spark.createDataFrame([], "rid long, k long, rts timestamp")

    got = {
        r["lid"]: r["asof_rid"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="ts", right_ts="rts",
            right_payload=("rid",), tie_break="rid", direction="forward",
        ).collect()
    }
    want = model_asof_forward(left, right)
    assert got == want
