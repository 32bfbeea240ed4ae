"""Round-numbering unit tests for bench.py (judge VERDICT r12 #2).

The driver's per-round artifact order is CORRECTNESS_rN.json first, THEN
bench. ``_current_round`` must therefore treat a CORRECTNESS record with no
matching BENCH record as THIS round's file (round N in progress), not as a
finished prior round — the old ``max(...) + 1`` labeled the driver's
round-12 bench as round 13 and wrote a stray ``bench_history/r13.json``.

Pure-Python tests: no SparkSession needed.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")


@pytest.fixture(scope="module")
def bench_mod():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("bench_under_test", None)


@pytest.fixture()
def round_dir(bench_mod, tmp_path, monkeypatch):
    monkeypatch.setattr(bench_mod, "ROUND_FILE_DIR", str(tmp_path))
    return tmp_path


def _touch(d, *names):
    for n in names:
        (d / n).write_text("{}")


def test_fresh_repo_is_round_1(bench_mod, round_dir):
    assert bench_mod._current_round() == 1


def test_completed_round_pair_advances(bench_mod, round_dir):
    _touch(round_dir, "CORRECTNESS_r12.json", "BENCH_r12.json")
    assert bench_mod._current_round() == 13


def test_correctness_written_bench_pending_is_same_round(bench_mod, round_dir):
    # The driver state mid-round-13: CORRECTNESS_r13 just written, bench
    # about to run. This is the exact state that was mislabeled round 14.
    _touch(round_dir, "CORRECTNESS_r12.json", "BENCH_r12.json", "CORRECTNESS_r13.json")
    assert bench_mod._current_round() == 13


def test_driver_skipped_correctness_round(bench_mod, round_dir):
    # Rounds 9/11 pattern: BENCH exists but the CORRECTNESS record was
    # never written. Newest BENCH round is complete → next round.
    _touch(round_dir, "CORRECTNESS_r08.json", "BENCH_r10.json")
    assert bench_mod._current_round() == 11


def test_driver_skipped_bench_round(bench_mod, round_dir):
    # Round-10 pattern: BENCH_r9 never existed; CORRECTNESS_r10 just
    # landed → we are in round 10, not 11.
    _touch(round_dir, "BENCH_r08.json", "CORRECTNESS_r10.json")
    assert bench_mod._current_round() == 10


def test_noise_floor_refuses_inside_spread_movers(bench_mod, monkeypatch):
    # Both queries trip the 1.3× ratio trigger, but q_noisy's delta
    # (+0.5 s) is below its own inter-pass spread (0.9 s) → refused;
    # q_real's delta (+5 s) clears its floor (0.1 s) → isolated.
    prev = {"q_noisy": 1.0, "q_real": 10.0}
    monkeypatch.setattr(bench_mod, "_previous_round_timings", lambda: prev)
    seen = []

    def fake_run(cmd, **kw):
        seen.append(cmd[-1])

        class P:
            stdout = '{"query": "x", "isolated_sec": 1.0}'

        return P()

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    timings = {"q_noisy": 1.5, "q_real": 15.0}
    floors = {"q_noisy": 0.9, "q_real": 0.1}
    out = bench_mod._isolate_movers(timings, floors)
    assert seen == ["q_real"]
    assert set(out) == {"q_real"}


def test_mover_baseline_excludes_current_round(bench_mod, round_dir, monkeypatch):
    # _previous_round_timings must only read STRICTLY-PRIOR round files —
    # a bench_history/rN.json from the current round would self-compare.
    import json

    hist = round_dir / "bench_history"
    hist.mkdir()
    (hist / "r12.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q_prior": 1.0}})
    )
    (hist / "r13.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"q_current": 9.9}})
    )
    _touch(round_dir, "CORRECTNESS_r12.json", "BENCH_r12.json", "CORRECTNESS_r13.json")
    monkeypatch.setattr(bench_mod, "SF_DIR", "/root/testdata/sf0.1")
    timings = bench_mod._previous_round_timings()
    assert "q_prior" in timings
    assert "q_current" not in timings


# --- calibration normalization (judge VERDICT r13 #5) --------------------------


def test_calibration_ratio_geometric_mean(bench_mod):
    this = {"gr_kcore": 3.0, "tx_corpus_build": 6.0}
    prev = {"gr_kcore": 2.0, "tx_corpus_build": 4.0}
    assert bench_mod._calibration_ratio(this, prev) == 1.5


def test_calibration_ratio_missing_sides_is_neutral(bench_mod):
    assert bench_mod._calibration_ratio({}, {"gr_kcore": 2.0}) == 1.0
    assert bench_mod._calibration_ratio({"gr_kcore": 2.0}, {}) == 1.0
    assert (
        bench_mod._calibration_ratio({"gr_kcore": 2.0}, {"tx_corpus_build": 4.0})
        == 1.0
    )


def test_calibration_ratio_disagreement_falls_back_to_smaller(
    bench_mod, capsys
):
    # gr_kcore "slowed" 2.4x while tx_corpus_build is flat: that is a
    # code-level regression in gr_kcore, not container drift — folding it
    # into the geometric mean (~1.55) would raise the effective mover
    # threshold suite-wide (round-14 advice). The smaller ratio wins and
    # a warning names both ratios.
    this = {"gr_kcore": 4.8, "tx_corpus_build": 4.0}
    prev = {"gr_kcore": 2.0, "tx_corpus_build": 4.0}
    assert bench_mod._calibration_ratio(this, prev) == 1.0
    assert "disagree" in capsys.readouterr().err


def test_calibration_ratio_agreement_keeps_geomean(bench_mod, capsys):
    # 1.3x vs 1.5x is within CALIBRATION_DISAGREE — ordinary container
    # drift, geometric mean applies and no warning is emitted.
    this = {"gr_kcore": 2.6, "tx_corpus_build": 6.0}
    prev = {"gr_kcore": 2.0, "tx_corpus_build": 4.0}
    got = bench_mod._calibration_ratio(this, prev)
    assert 1.3 <= got <= 1.5
    assert "disagree" not in capsys.readouterr().err


def test_isolate_movers_accepts_preloaded_prev(bench_mod, monkeypatch):
    # main() passes the previous-round record it already loaded; the
    # fallback scan must NOT run in that case (round-14 advice).
    def boom():
        raise AssertionError("re-scanned previous round record")

    monkeypatch.setattr(bench_mod, "_previous_round_timings", boom)

    def fake_run(cmd, **kw):
        class P:
            stdout = '{"query": "x", "isolated_sec": 1.0}'

        return P()

    import subprocess

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = bench_mod._isolate_movers(
        {"q": 5.0}, {"q": 0.1}, 1.0, prev={"q": 1.0}
    )
    assert set(out) == {"q"}


def test_calibration_ratio_clamped(bench_mod):
    lo, hi = bench_mod.CALIBRATION_RATIO_CLAMP
    assert (
        bench_mod._calibration_ratio({"gr_kcore": 100.0}, {"gr_kcore": 1.0}) == hi
    )
    assert (
        bench_mod._calibration_ratio({"gr_kcore": 1.0}, {"gr_kcore": 100.0}) == lo
    )


def test_mover_suppressed_when_calibration_explains_drift(
    bench_mod, round_dir, monkeypatch
):
    """A uniform 1.5x container slowdown must produce an EMPTY mover list
    when the calibration pair drifted by the same 1.5x — the exact r13
    failure mode (14 isolated re-runs, all noise)."""
    import json

    prev = {
        "metric": "headline_queries_total_time",
        "value": 10.0,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"dd_winnow_pairs": 2.0, "gr_pagerank_convergence": 3.0},
        "calibration": {"gr_kcore": 2.0, "tx_corpus_build": 4.0},
    }
    os.makedirs(round_dir / "var", exist_ok=True)
    (round_dir / "var" / "bench_r13_final.json").write_text(json.dumps(prev))
    _touch(round_dir, "CORRECTNESS_r13.json", "BENCH_r13.json")
    monkeypatch.setattr(bench_mod, "SF_DIR", "/root/testdata/sf0.1")

    rec = bench_mod._previous_round_record()
    assert rec["calibration"] == prev["calibration"]

    this_cal = {"gr_kcore": 3.0, "tx_corpus_build": 6.0}  # container 1.5x slower
    ratio = bench_mod._calibration_ratio(this_cal, rec["calibration"])
    timings = {"dd_winnow_pairs": 3.0, "gr_pagerank_convergence": 4.5}  # +50%

    calls = []
    monkeypatch.setattr(
        bench_mod, "run_isolated", lambda name: calls.append(name)
    )
    import subprocess as _sp

    def _no_spawn(*a, **k):
        calls.append(a)
        raise AssertionError("no isolation should be spawned")

    monkeypatch.setattr(_sp, "run", _no_spawn)
    out = bench_mod._isolate_movers(timings, {}, ratio)
    assert out == {}
    assert calls == []
    # sanity: WITHOUT normalization the same drift would have flagged both
    movers_raw = [
        n for n, t in timings.items()
        if t / prev["queries"][n] > bench_mod.ISOLATE_RATIO
    ]
    assert sorted(movers_raw) == ["dd_winnow_pairs", "gr_pagerank_convergence"]
