"""Unit tests for the mechanical scaling-gate machinery in
scripts/scaling_bench.py (r5 VERDICT #2: the window-tagging rule must be
code, not prose — so its branches get pinned like any other code path).

No Spark here: run_at / _job_cmd are monkeypatched, so these tests cover
exactly the decision logic (canary tagging, band ratchet, degraded-skip
probe, hung-job timeout kill) that live ladder runs exercise only one
branch of per run.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)
import scaling_bench as sb  # noqa: E402


def _write_ref(path, level_best=200000.0, n_convs=150000, frac=0.9):
    with open(path, "w") as f:
        json.dump(
            {
                "canary_cpus": 16,
                "level_best_tps": level_best,
                "healthy_frac": frac,
                "n_convs": n_convs,
            },
            f,
        )


@pytest.fixture
def iso(monkeypatch, tmp_path):
    """Isolate module-level paths + env so tests never touch the real
    SCALING_LOG.jsonl / scaling_reference.json."""
    monkeypatch.setattr(sb, "REF_PATH", str(tmp_path / "ref.json"))
    monkeypatch.setattr(sb, "LOG_PATH", str(tmp_path / "log.jsonl"))
    monkeypatch.setattr(sb, "RETRY_SLEEP_SEC", 0)
    monkeypatch.delenv("SPARK_GRAFT_SCALING_SKIP_DEGRADED", raising=False)
    return tmp_path


def _fake_run_at(tps):
    def run_at(cpus, n_convs):
        return {"cpus": cpus, "n_convs": n_convs, "turns_per_sec": tps}

    return run_at


# ---------------------------------------------------------------- canary


def test_canary_no_reference_is_uncalibrated(iso, monkeypatch):
    monkeypatch.setattr(sb, "run_at", _fake_run_at(100000.0))
    c = sb._canary_gate(150000)
    assert c["window"] == "uncalibrated"
    assert c["reference_band"] is None


def test_canary_healthy_at_and_above_band_floor(iso, monkeypatch):
    _write_ref(sb.REF_PATH, level_best=200000.0)
    monkeypatch.setattr(sb, "run_at", _fake_run_at(180000.0))  # exactly 0.9x
    c = sb._canary_gate(150000)
    assert c["window"] == "healthy"
    assert c["reference_band"] == [180000.0, 200000.0]


def test_canary_degraded_below_band_floor(iso, monkeypatch):
    _write_ref(sb.REF_PATH, level_best=200000.0)
    monkeypatch.setattr(sb, "run_at", _fake_run_at(179999.0))
    assert sb._canary_gate(150000)["window"] == "degraded"


def test_canary_scale_mismatch_is_uncalibrated(iso, monkeypatch):
    """A band measured at 150k convs says nothing about a 2k-conv run —
    the r6 smoke test at n_convs=2000 must tag uncalibrated, not degraded."""
    _write_ref(sb.REF_PATH, level_best=200000.0, n_convs=150000)
    monkeypatch.setattr(sb, "run_at", _fake_run_at(12000.0))
    c = sb._canary_gate(2000)
    assert c["window"] == "uncalibrated"
    assert c["reference_band"] is None


# ---------------------------------------------------------------- ratchet


def test_reference_ratchets_up_after_healthy_run(iso):
    canary = {
        "canary_cpus": 16,
        "canary_tps": 210000.0,
        "window": "healthy",
        "reference_band": [180000.0, 200000.0],
        "healthy_frac": 0.9,
        "ref_n_convs": 150000,
    }
    sb._update_reference(canary, best_16_tps=215000.0, n_convs=150000)
    with open(sb.REF_PATH) as f:
        assert json.load(f)["level_best_tps"] == 215000.0


def test_reference_never_ratchets_on_degraded_or_offscale(iso):
    base = {
        "canary_cpus": 16,
        "canary_tps": 150000.0,
        "window": "degraded",
        "reference_band": [180000.0, 200000.0],
        "healthy_frac": 0.9,
        "ref_n_convs": 150000,
    }
    sb._update_reference(base, best_16_tps=999999.0, n_convs=150000)
    assert not os.path.exists(sb.REF_PATH)
    # healthy but at a different input scale: band stays untouched too
    sb._update_reference(
        {**base, "window": "healthy"}, best_16_tps=999999.0, n_convs=2000
    )
    assert not os.path.exists(sb.REF_PATH)


def test_reference_never_ratchets_down(iso):
    canary = {
        "canary_cpus": 16,
        "canary_tps": 190000.0,
        "window": "healthy",
        "reference_band": [180000.0, 200000.0],
        "healthy_frac": 0.9,
        "ref_n_convs": 150000,
    }
    sb._update_reference(canary, best_16_tps=185000.0, n_convs=150000)
    with open(sb.REF_PATH) as f:
        # max(prior 200k, run 185k, canary 190k) = prior
        assert json.load(f)["level_best_tps"] == 200000.0


# ---------------------------------------------------------------- probe


def test_degraded_probe_skips_ladder_and_logs_canary_row(iso, monkeypatch):
    """SPARK_GRAFT_SCALING_SKIP_DEGRADED=1 + degraded canary: exit 2,
    exactly ONE job ran (the canary — no ladder), and the probe row is in
    the append-only log with its self-identifying note."""
    _write_ref(sb.REF_PATH, level_best=200000.0)
    calls = []

    def run_at(cpus, n_convs):
        calls.append(cpus)
        return {"cpus": cpus, "n_convs": n_convs, "turns_per_sec": 100000.0}

    monkeypatch.setattr(sb, "run_at", run_at)
    monkeypatch.setenv("SPARK_GRAFT_SCALING_SKIP_DEGRADED", "1")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_CONVS", "150000")
    with pytest.raises(SystemExit) as exc:
        sb.main()
    assert exc.value.code == 2
    assert calls == [16]
    with open(sb.LOG_PATH) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    assert len(rows) == 1
    assert rows[0]["window"] == "degraded"
    assert rows[0]["pass"] is False
    assert rows[0]["per_pass_4to16"] is None
    assert "ladder not launched" in rows[0]["note"]
    # a skipped ladder must never ratchet the band
    with open(sb.REF_PATH) as f:
        assert json.load(f)["level_best_tps"] == 200000.0


def test_probe_mode_off_by_default_runs_ladder(iso, monkeypatch):
    """Without the env var a degraded window still measures (auto-annotated
    FAIL row), per the r5 VERDICT #2 contract."""
    _write_ref(sb.REF_PATH, level_best=200000.0)
    calls = []

    def run_at(cpus, n_convs):
        calls.append(cpus)
        return {
            "cpus": cpus,
            "n_convs": n_convs,
            "n_turns": 100,
            "sec": 1.0,
            "turns_per_sec": 100000.0,
        }

    monkeypatch.setattr(sb, "run_at", run_at)
    monkeypatch.setattr(sb.time, "sleep", lambda s: None)
    monkeypatch.setenv("SPARK_GRAFT_SCALING_CONVS", "150000")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_ROUNDS", "1")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_LEVELS", "4,16")
    bench_md = iso / "BENCH.md"
    monkeypatch.setattr(sb, "REPO", str(iso))
    sb.main()
    assert calls == [16, 4, 16]  # canary + one 4,16 pass
    with open(sb.LOG_PATH) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    assert rows[-1]["window"] == "degraded"
    assert rows[-1]["pass"] is False  # flat tps -> efficiency 0.25 < 0.8
    assert bench_md.exists()


# ---------------------------------------------------------------- run_at


def test_run_at_parses_last_stdout_line(iso, monkeypatch):
    monkeypatch.setattr(
        sb,
        "_job_cmd",
        lambda cpus: [
            sys.executable,
            "-c",
            "print('noise'); print('{\"turns_per_sec\": 42.0}')",
        ],
    )
    assert sb.run_at(4, 100)["turns_per_sec"] == 42.0


def test_run_at_kills_hung_job_group_and_raises(iso, monkeypatch):
    """A wedged job (observed r6: JVM + Python worker both asleep on their
    socket) must be SIGKILLed with its whole process group and counted as
    a failed attempt; three hangs raise instead of stalling forever."""
    monkeypatch.setenv("SPARK_GRAFT_SCALING_JOB_TIMEOUT", "1")
    monkeypatch.setattr(sb, "_job_cmd", lambda cpus: ["sleep", "600"])
    import time as _time

    t0 = _time.monotonic()
    with pytest.raises(RuntimeError, match="failed 3 times"):
        sb.run_at(4, 100)
    # 3 attempts x 1s timeout, zero retry sleep: far below the 600s the
    # job would have hung without the kill
    assert _time.monotonic() - t0 < 30
