"""Winnowing substring-dedup semantics: guarantee threshold + plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.substring import (
    WINNOW_T,
    dd_winnow_pairs,
)
from harvard_artifacts_collection_data_engineering_analytics_app_spark.queries import (
    registry,
)


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _mk(doc_id, text):
    return (doc_id, text, "en", "test", len(text))


def test_threshold_is_exact(spark, tmp_path):
    """A shared run of exactly T chars is always found; T-1 never is.

    This is the winnowing guarantee boundary (Schleimer et al. §2): the
    fingerprint stage must catch every >=T overlap, and the verification
    stage must remove every <T overlap a fingerprint collision surfaces.
    """
    import random

    rng = random.Random(7)

    def filler(n=90):
        # unique-per-call word soup so no two docs share fillers
        return " ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
            for _ in range(n // 7)
        )

    shared_t = "X" + "0123456789" * 3  # 31 chars, digit alphabet ∉ fillers
    shared_t1 = shared_t[:-1]  # 30 chars
    rows = [
        _mk(1, filler() + shared_t + filler()),
        _mk(2, filler() + shared_t + filler()),
        _mk(3, filler() + shared_t1 + filler()),
        _mk(4, "short doc"),  # < T chars: can never pair
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        (r["a_id"], r["b_id"])
        for r in dd_winnow_pairs(spark, sf_dir).collect()
    }
    assert (1, 2) in got
    # doc 3 shares only T-1 chars with docs 1/2 — must be filtered out
    assert all(3 not in p and 4 not in p for p in got)


def test_identical_docs_pair(spark, tmp_path):
    text = "the same exact document body with plenty of characters in it"
    rows = [_mk(1, text), _mk(2, text), _mk(3, "entirely different words here xyz")]
    sf_dir = _write_docs(spark, tmp_path, rows)
    got = {
        (r["a_id"], r["b_id"])
        for r in dd_winnow_pairs(spark, sf_dir).collect()
    }
    assert got == {(1, 2)}
    assert len(text) >= WINNOW_T


def test_no_cartesian_in_plan(spark, oracle_sf_dir):
    """Candidate generation must be an equi-join on the fingerprint —
    never a nested-loop/cartesian over document pairs."""
    df = registry.all_specs()["dd_winnow_pairs"].builder(spark, oracle_sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_fingerprints_match_reference_definition(spark):
    """The Catalyst winnow expression must equal the paper definition
    (min of every G-window of the k-gram hash sequence, deduplicated)
    computed by a direct Python reference — across random hash arrays,
    including ties, short arrays, and constant runs. One Spark job
    evaluates all cases."""
    import random

    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.substring import (
        WINNOW_G,
        winnow_fingerprints,
    )

    rng = random.Random(42)
    cases = []
    for i in range(60):
        n = rng.randrange(0, 40)
        # small value range → frequent ties; sprinkle constant runs
        hs = [rng.randrange(0, 9) for _ in range(n)]
        if n > 10 and i % 3 == 0:
            hs[2:7] = [hs[2]] * 5
        cases.append((i, hs))

    def reference(hs):
        if len(hs) < WINNOW_G:
            return []
        out = []
        for j in range(len(hs) - WINNOW_G + 1):
            out.append(min(hs[j : j + WINNOW_G]))
        seen, dedup = set(), []
        for v in out:
            if v not in seen:
                seen.add(v)
                dedup.append(v)
        return dedup

    import pyspark.sql.functions as F

    df = spark.createDataFrame(cases, "i long, hs array<bigint>")
    got = {
        r["i"]: list(r["fp"])
        for r in df.select(
            "i", winnow_fingerprints(F.col("hs")).alias("fp")
        ).collect()
    }
    for i, hs in cases:
        assert got[i] == reference(hs), f"case {i}: {hs}"
