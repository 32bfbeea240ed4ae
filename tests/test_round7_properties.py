"""Property tests: round-7 operators vs pure-Python reference models.

The oracle-parity gate proves each operator against DuckDB on the driver
corpus; these tests additionally drive the same builders over RANDOM
small inputs where an independent Python model is trivially correct —
the structures the fixed corpus may never exercise (single-day islands,
all-days-consecutive, duplicate texts, tie-heavy distance fields).
"""

from __future__ import annotations

import datetime as dt
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .conftest import slow_full

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.similarity import (
    KM_SCALE,
    MAXMIN_K,
    ss_maxmin_diversity,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries.functions_surface import (
    ISLANDS_TOPN,
    fx_gaps_islands,
)

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        [
            (i, EPOCH + dt.timedelta(days=day, minutes=i % 59), uid, "X", 1.0, "{}")
            for i, (uid, day) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def _model_islands(rows):
    """All (user, start, end, len) islands of consecutive active days,
    ranked (len desc, user, start), top ISLANDS_TOPN."""
    base = (EPOCH - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)).days
    per_user = {}
    for uid, day in rows:
        per_user.setdefault(uid, set()).add(base + day)
    islands = []
    for uid, days in per_user.items():
        for _, grp in itertools.groupby(
            enumerate(sorted(days)), key=lambda p: p[1] - p[0]
        ):
            ds = [d for _, d in grp]
            islands.append((uid, ds[0], ds[-1], len(ds)))
    islands.sort(key=lambda t: (-t[3], t[0], t[1]))
    return islands[:ISLANDS_TOPN]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # user
            st.integers(min_value=0, max_value=25),  # day offset
        ),
        min_size=1,
        max_size=40,
    )
)
@slow_full  # heavy model replay; see conftest (VERDICT r15 #2)
def test_gaps_islands_matches_model(spark, tmp_path_factory, rows):
    path = str(tmp_path_factory.mktemp("gi"))
    _write_events(spark, path, rows)
    got = [
        (r["user_id"], r["start_day"], r["end_day"], r["len_days"])
        for r in fx_gaps_islands(spark, path).collect()
    ]
    assert got == _model_islands(rows)


def _model_maxmin(vectors):
    """Greedy k-center on the fixed-point grid, ties to smaller vec_id."""
    import math

    fixed = {
        vid: [math.floor(x * KM_SCALE + 0.5) for x in v]
        for vid, v in vectors
    }
    ids = sorted(fixed)
    picks = [(1, ids[0], None)]
    chosen = [ids[0]]
    for k in range(2, min(MAXMIN_K, len(ids)) + 1):
        best = None
        for vid in ids:
            if vid in chosen:
                continue
            d = min(
                sum((a - b) ** 2 for a, b in zip(fixed[vid], fixed[c]))
                for c in chosen
            )
            if best is None or d > best[0] or (d == best[0] and vid < best[1]):
                best = (d, vid)
        picks.append((k, best[1], best[0]))
        chosen.append(best[1])
    return picks


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-2.0, max_value=2.0, allow_nan=False, width=32
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=MAXMIN_K,
        max_size=12,
    )
)
@slow_full  # heavy model replay; see conftest (VERDICT r15 #2)
def test_maxmin_diversity_matches_model(spark, tmp_path_factory, vecs):
    path = str(tmp_path_factory.mktemp("mm"))
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    got = [
        (r["pick"], r["vec_id"], r["min_dist2"])
        for r in ss_maxmin_diversity(spark, path).collect()
    ]
    # the model quantizes float32-rounded values exactly as the operator:
    # both read the same parquet floats, so replicate via the written rows
    written = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    assert got == _model_maxmin(written)


def _model_ks(vals):
    """Binned two-sample KS: cohorts by index parity, support = values
    rounded to KS_BIN_DECIMALS."""
    from collections import Counter

    from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries.functions_surface import (
        KS_BIN_DECIMALS,
    )

    a = Counter(round(v, KS_BIN_DECIMALS) for i, v in enumerate(vals) if i % 2 == 0)
    b = Counter(round(v, KS_BIN_DECIMALS) for i, v in enumerate(vals) if i % 2 == 1)
    na, nb = sum(a.values()), sum(b.values())
    fa = fb = 0
    d = 0
    for v in sorted(set(a) | set(b)):
        fa += a.get(v, 0)
        fb += b.get(v, 0)
        d = max(d, abs(fa * nb - fb * na))
    return na, nb, d


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=50.0, allow_nan=False, width=32),
        min_size=4,
        max_size=60,
    )
)
@slow_full  # heavy model replay; see conftest (VERDICT r15 #2)
def test_ks_drift_matches_model(spark, tmp_path_factory, vals):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries.functions_surface import (
        fx_ks_drift,
    )

    path = str(tmp_path_factory.mktemp("ks"))
    df = spark.createDataFrame(
        [
            (
                i,  # event_id: parity defines the cohort
                EPOCH + dt.timedelta(minutes=i),
                i % 7,
                "X",
                float(v),
                "{}",
            )
            for i, v in enumerate(vals)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    row = fx_ks_drift(spark, path).collect()[0]
    na, nb, d = _model_ks([float(v) for v in vals])
    assert (row["na"], row["nb"], row["d_num"]) == (na, nb, d)


def _model_mattr(text, w):
    toks = text.strip().split()
    n = len(toks)
    if n < w:
        return None
    total = sum(len(set(toks[i : i + w])) for i in range(n - w + 1))
    return n, n - w + 1, total


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "ee", "ff"]),
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=6,
    )
)
@slow_full  # heavy model replay; see conftest (VERDICT r15 #2)
def test_mattr_matches_brute_force_windows(spark, tmp_path_factory, docs):
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.functions.text_queries import (
        MATTR_W,
        tx_mattr,
    )

    path = str(tmp_path_factory.mktemp("mattr"))
    rows = [(i, " ".join(toks), "en", "t", len(" ".join(toks))) for i, toks in enumerate(docs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_windows"], r["sum_utypes"])
        for r in tx_mattr(spark, path).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        m = _model_mattr(" ".join(toks), MATTR_W)
        if m is not None:
            want[i] = m
    assert got == want
