"""bench.py output contract: a parseable JSON line must survive ANY kill.

Round-2 and round-4 postmortems: the driver's bench run timed out and
recorded NOTHING (rc=124, parsed=null) — round 2 because the single JSON
line came after ALL stages, round 4 because the probe + attach + cold
compile burned the driver's wall before the first byte. The contract now is
a RATCHET (the driver parses the LAST JSON line; every line is complete):

* a provisional line (last-known-good TPU record or zeros, marked
  ``breakdown.provisional``) is printed within ~2 s of process start —
  BEFORE the probe, BEFORE backend init, BEFORE importing jax;
* a second provisional line follows the backend decision;
* the primary measured line (TSDF metric) is printed the moment the
  primary stage completes — a SIGTERM during any later stage must not lose
  it; further lines follow each completed secondary stage;
* secondary stages are budget-gated (HIVE_BENCH_BUDGET_S) with explicit
  ``<stage>_skipped`` markers, so the process exits 0 inside its budget.

These tests run bench.py as a subprocess with test hooks that stub the heavy
stages (the real integrator/DPT are covered by their own test modules — here
only the emission/kill/budget behaviour is under test).
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO_ROOT, "bench.py")


def _bench_env(**extra):
    env = dict(os.environ)
    env.update({
        "HIVE_BENCH_FORCE_CPU": "1",
        "HIVE_BENCH_FAKE_TSDF": "123456789",
    })
    env.update(extra)
    return env


def _parse_json_lines(text):
    lines = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            lines.append(json.loads(line))
    return lines


def test_budget_skips_secondary_stages_and_exits_zero():
    result = subprocess.run(
        [sys.executable, BENCH],
        env=_bench_env(HIVE_BENCH_BUDGET_S="0"),
        capture_output=True, text=True, timeout=300)

    assert result.returncode == 0, result.stderr[-2000:]
    payloads = _parse_json_lines(result.stdout)
    # Startup provisional + backend-ready provisional + primary + final.
    assert len(payloads) == 4

    for payload in payloads:
        assert payload["metric"] == "tsdf_voxel_updates_per_second"
        assert isinstance(payload["value"], int)
        assert "breakdown" in payload

    # The first two lines are the emit-first ratchet: complete, parseable,
    # and self-describing as provisional.
    for payload in payloads[:2]:
        assert payload["breakdown"]["provisional"] is True
    assert payloads[0]["breakdown"]["provisional_stage"] == "startup"
    assert payloads[1]["breakdown"]["provisional_stage"] == "backend-ready"

    # The measured lines carry this run's (faked) number.
    for payload in payloads[2:]:
        assert payload["value"] == 123456789
        assert payload["vs_baseline"] == pytest.approx(0.123, abs=1e-6)
        assert "provisional" not in payload["breakdown"]

    final = payloads[-1]
    assert final["breakdown"]["depth_skipped"] == "over budget"
    assert final["breakdown"]["e2e_skipped"] == "over budget"
    assert "elapsed_s" in final["breakdown"]
    # The primary line must already say which DPT weight mode would run.
    assert payloads[2]["breakdown"]["dpt_weights"] in ("converted", "random")


def test_non_tpu_run_carries_last_known_good_tpu_record():
    """An outage/CPU round must still carry the freshest TPU-witnessed
    number, clearly labeled (round-3 verdict: the official record showed the
    CPU fallback 0.055 while the in-round TPU run hit 2.017)."""
    result = subprocess.run(
        [sys.executable, BENCH],
        env=_bench_env(HIVE_BENCH_BUDGET_S="0"),
        capture_output=True, text=True, timeout=300)

    assert result.returncode == 0, result.stderr[-2000:]
    final = _parse_json_lines(result.stdout)[-1]
    record = final["breakdown"]["last_known_good_tpu"]
    assert record["metric"] == "tsdf_voxel_updates_per_second"
    # Shape only, not the measured value: bench rewrites LAST_GOOD_TPU.json
    # on every real TPU run, and one legitimately slow tunnel session must
    # not break an unrelated unit test.
    assert isinstance(record["vs_baseline"], (int, float))
    assert record["date"] and record["commit"]
    # This run's own (faked) number must stay the headline value.
    assert final["value"] == 123456789


def test_sigterm_mid_stage_preserves_primary_line():
    """Kill the process while a (faked) slow depth stage runs; the primary
    JSON line must already be on stdout and parse cleanly."""
    proc = subprocess.Popen(
        [sys.executable, BENCH],
        env=_bench_env(HIVE_BENCH_FAKE_SLOW_STAGE="depth",
                       HIVE_BENCH_BUDGET_S="3600"),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)

    try:
        deadline = time.monotonic() + 240
        measured_line = None
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            if line.strip().startswith("{"):
                payload = json.loads(line)
                if not payload["breakdown"].get("provisional"):
                    measured_line = payload
                    break
        assert measured_line is not None, "no measured line before the slow stage"

        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=60)

        assert measured_line["metric"] == "tsdf_voxel_updates_per_second"
        assert measured_line["value"] == 123456789
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_hung_probe_still_emits_provisional_line_immediately():
    """The round-4 failure mode: a probe/attach that hangs before backend
    init. The emit-first line must already be on stdout — complete and
    parseable — long before the (faked, minutes-long) probe would return."""
    env = dict(os.environ)
    env.pop("HIVE_BENCH_FORCE_CPU", None)
    env.update({
        "JAX_PLATFORMS": "axon",           # non-cpu → the probe path runs
        "HIVE_BENCH_FAKE_SLOW_STAGE": "probe",
        "HIVE_BENCH_FAKE_TSDF": "123456789",
    })
    proc = subprocess.Popen(
        [sys.executable, BENCH], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)

    try:
        start = time.monotonic()
        deadline = start + 90
        first_line = None
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            if line.strip().startswith("{"):
                first_line = line
                break
        elapsed = time.monotonic() - start
        assert first_line is not None, "no JSON line while the probe hung"
        # Generous bound for a loaded 1-core VM; the line needs only the
        # stdlib (json emitted before `import jax`), so seconds, not minutes.
        assert elapsed < 60, f"provisional line took {elapsed:.0f}s"

        payload = json.loads(first_line)
        assert payload["metric"] == "tsdf_voxel_updates_per_second"
        assert payload["breakdown"]["provisional"] is True
        assert payload["breakdown"]["provisional_stage"] == "startup"
        assert isinstance(payload["value"], int)
        assert isinstance(payload["vs_baseline"], (int, float))
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()


def test_primary_stage_gated_out_when_budget_exhausted():
    """A wall that cannot fit even the primary TSDF stage must not start
    it (a driver kill mid-dispatch can wedge the tunnelled device): the
    bench exits 0 with a provisional line marked tsdf_skipped."""
    env = dict(os.environ)
    env.update({"HIVE_BENCH_FORCE_CPU": "1", "HIVE_BENCH_BUDGET_S": "0"})
    env.pop("HIVE_BENCH_FAKE_TSDF", None)
    result = subprocess.run(
        [sys.executable, BENCH], env=env,
        capture_output=True, text=True, timeout=300)

    assert result.returncode == 0, result.stderr[-2000:]
    final = _parse_json_lines(result.stdout)[-1]
    assert final["breakdown"]["provisional"] is True
    assert final["breakdown"]["provisional_stage"] == "primary-gated-out"
    assert final["breakdown"]["tsdf_skipped"] == "over budget"


def test_cpu_fallback_retries_and_adopts_child_record():
    """Second-chance retry: a failed probe plan (tunnel flap) falls back to
    CPU, but while budget remains the bench re-probes; on recovery it reruns
    itself in a fresh subprocess and the FINAL line adopts that record,
    marked retried_after_cpu_fallback. Probe outcomes scripted 0,0 (BOTH
    plan attempts fail — the default plan probes twice) then 1 (retry
    succeeds); the child is forced onto CPU via the test hook and adopted
    via HIVE_BENCH_RETRY_ADOPT_ANY."""
    env = dict(os.environ)
    env.pop("HIVE_BENCH_FORCE_CPU", None)
    env.update({
        "JAX_PLATFORMS": "axon",          # non-cpu → the probe path runs
        "HIVE_BENCH_FAKE_PROBE": "0,0,1",
        "HIVE_BENCH_FAKE_TSDF": "123456789",
        "HIVE_BENCH_RETRY_CHILD_FORCE_CPU": "1",
        "HIVE_BENCH_RETRY_ADOPT_ANY": "1",
        "HIVE_BENCH_BUDGET_S": "3600",
        # The CPU-forced child would otherwise run the REAL depth stage
        # (minutes on one host core); inherited by the child.
        "HIVE_BENCH_DEPTH": "0",
    })
    result = subprocess.run(
        [sys.executable, BENCH], env=env,
        capture_output=True, text=True, timeout=300)

    assert result.returncode == 0, result.stderr[-2000:]
    payloads = _parse_json_lines(result.stdout)
    final = payloads[-1]
    marker = final["breakdown"]["retried_after_cpu_fallback"]
    assert marker["probe_attempts"] == 1
    assert final["value"] == 123456789
    # The pre-retry record is still earlier in the ratchet, labeled as the
    # fallback it was.
    fallback_lines = [p for p in payloads
                     if p["breakdown"].get("backend", "").startswith(
                         "cpu-fallback")]
    assert fallback_lines


class TestLastGoodMerge:
    """merge_last_known_good: latest fields win, absent stages persist,
    and e2e_best preserves the best-witnessed e2e across weather."""

    def test_bad_weather_run_keeps_best_e2e(self):
        import bench

        previous = {"value": 1, "e2e_s_per_frame": 0.76,
                    "e2e_vs_baseline": 13.2,
                    "e2e_reps": {"warm_spread_s": 0.08},
                    "date": "2026-08-20"}
        record = {"value": 2, "e2e_s_per_frame": 2.85,
                  "e2e_vs_baseline": 3.5,
                  "e2e_reps": {"warm_spread_s": 4.52}}
        merged = bench.merge_last_known_good(previous, record,
                                             "2026-08-21", "abc")
        assert merged["value"] == 2                  # latest wins
        assert merged["e2e_s_per_frame"] == 2.85     # latest, honest
        best = merged["e2e_best"]
        assert best["e2e_s_per_frame"] == 0.76       # capability preserved
        assert best["date"] == "2026-08-20"
        assert merged["commit"] == "abc"

    def test_better_run_advances_best(self):
        import bench

        previous = {"e2e_best": {"e2e_s_per_frame": 0.9, "date": "d0"},
                    "e2e_s_per_frame": 2.0, "date": "d1"}
        record = {"e2e_s_per_frame": 0.7, "e2e_reps": {}}
        merged = bench.merge_last_known_good(previous, record, "d2", "c")
        assert merged["e2e_best"]["e2e_s_per_frame"] == 0.7
        assert merged["e2e_best"]["date"] == "d2"

    def test_bad_weather_run_keeps_best_tsdf(self):
        import bench

        previous = {"value": 3142925336, "vs_baseline": 3.143,
                    "date": "2026-08-21"}
        record = {"value": 2613697998, "vs_baseline": 2.614}
        merged = bench.merge_last_known_good(previous, record, "d2", "c")
        assert merged["value"] == 2613697998          # latest, honest
        assert merged["tsdf_best"]["value"] == 3142925336
        assert merged["tsdf_best"]["date"] == "2026-08-21"

    def test_tsdf_only_run_preserves_stages(self):
        import bench

        previous = {"value": 1, "depth_ms_per_frame": 6.8,
                    "e2e_s_per_frame": 0.76, "date": "d0"}
        merged = bench.merge_last_known_good(previous, {"value": 3},
                                             "d1", "c")
        assert merged["depth_ms_per_frame"] == 6.8
        assert merged["e2e_s_per_frame"] == 0.76
        assert merged["e2e_best"]["e2e_s_per_frame"] == 0.76
        assert merged["value"] == 3


class TestE2ERepAggregation:
    """The warm-rep protocol's reduction (VERDICT r3 #4): rep 1 is the cold
    rep and is discarded whenever warm reps exist; the reported stage totals
    come from the median warm rep; the spread covers the warm reps only."""

    def test_three_reps(self):
        import bench

        reps = [(2.58, {"a": 1}), (0.95, {"a": 2}), (0.93, {"a": 3})]
        median, totals, stats = bench.aggregate_e2e_reps(reps)
        assert median == 0.95          # median of the two warm reps (upper)
        assert totals == {"a": 2}
        assert stats["cold_s_per_frame"] == 2.58
        assert stats["warm_reps"] == 2
        assert stats["warm_min_s_per_frame"] == 0.93
        assert stats["warm_spread_s"] == round(0.95 - 0.93, 2)
        assert stats["reps_s_per_frame"] == [2.58, 0.95, 0.93]

    def test_single_rep_budget_cut(self):
        import bench

        median, totals, stats = bench.aggregate_e2e_reps([(3.1, {"a": 1})])
        assert median == 3.1           # cold-only: nothing else to report
        assert totals == {"a": 1}
        assert stats["warm_reps"] == 0
        assert stats["warm_spread_s"] == 0.0

    def test_cold_tie_does_not_leak_cold_stage_totals(self):
        """A cold rep whose time TIES the warm median must not contribute
        its stage totals (they include compile/attach costs)."""
        import bench

        reps = [(0.95, {"who": "cold"}), (0.95, {"who": "warm1"}),
                (0.93, {"who": "warm2"})]
        median, totals, _ = bench.aggregate_e2e_reps(reps)
        assert median == 0.95
        assert totals == {"who": "warm1"}
