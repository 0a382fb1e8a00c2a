"""bench.py outage-path contract: a dead/contended accelerator pool, a pool
that flaps MID-measurement, or a crashed child must each produce ONE
parseable JSON line — `chip_unavailable` or `measurement_incomplete` — with
the most recent committed on-chip measurement embedded (clearly labeled
stale). Never a hang (rounds 3+4 both ended rc=124) and never a bare zero
with no evidence.

Runs entirely on host: the device probe is monkeypatched out and fixture
run records live in tmp_path (the round-4 advisor flagged asserting against
committed runs/ artifacts).
"""

from __future__ import annotations

import importlib.util
import io
import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_mod(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # the module must never read or write the real repo during tests
    mod.REPO = str(tmp_path)
    os.makedirs(tmp_path / "runs", exist_ok=True)
    return mod


def _fixture_record(value, recorded_unix=None, **extra):
    detail = {"seconds": 20.0}
    if recorded_unix is not None:
        detail["recorded_unix"] = recorded_unix
    rec = {"metric": "e2e_seg_throughput_512", "value": value,
           "unit": "vox/s", "vs_baseline": value / 3.0e6, "detail": detail}
    rec.update(extra)
    return rec


def _write(tmp_path, name, rec):
    with open(tmp_path / "runs" / name, "w") as f:
        json.dump(rec, f)


def _capture_main(bench_mod, argv=None):
    out = io.StringIO()
    old = sys.stdout
    sys.stdout = out
    try:
        rc = bench_mod.main(argv or [])
    finally:
        sys.stdout = old
    return rc, out.getvalue()


def _run_main_unavailable(bench_mod, monkeypatch):
    monkeypatch.setattr(bench_mod, "_probe_chip", lambda *a, **k: False)
    monkeypatch.setenv("BENCH_PROBE_BUDGET", "0.2")
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "0.1")
    return _capture_main(bench_mod)


def test_outage_emits_structured_record(bench_mod, monkeypatch):
    rc, text = _run_main_unavailable(bench_mod, monkeypatch)
    assert rc == 1
    lines = [ln for ln in text.splitlines() if ln.strip()]
    assert len(lines) == 1, text
    rec = json.loads(lines[0])
    assert rec["chip_unavailable"] is True
    assert rec["value"] == 0 and rec["vs_baseline"] == 0
    assert rec["detail"]["probes"] >= 1
    assert rec["detail"]["probe_budget_s"] == 0.2


def test_outage_embeds_newest_measurement(bench_mod, monkeypatch, tmp_path):
    # three fixtures: an old timestamped record, a NEWER timestamped record,
    # and an untimestamped (round-4-style) record — newest timestamp wins
    _write(tmp_path, "bench_old.json", _fixture_record(4.0e6, 100.0))
    _write(tmp_path, "bench_new.json", _fixture_record(6.5e6, 200.0))
    _write(tmp_path, "bench_r04e.json", _fixture_record(6.7e6))
    rc, text = _run_main_unavailable(bench_mod, monkeypatch)
    rec = json.loads(text.strip())
    last = rec["detail"]["last_measured_stale"]
    assert last is not None
    assert last["path"].endswith("bench_new.json")
    assert last["record"]["value"] == 6.5e6
    assert last["record"]["unit"] == "vox/s"


def test_latest_record_skips_outages_and_foreign_metrics(bench_mod, tmp_path):
    _write(tmp_path, "bench_outage.json",
           _fixture_record(0, 999.0, chip_unavailable=True))
    _write(tmp_path, "bench_incomplete.json",
           _fixture_record(0, 998.0, measurement_incomplete=True))
    _write(tmp_path, "bench_train.json",
           {"metric": "train_step", "value": 4.1, "unit": "s"})
    _write(tmp_path, "bench_good.json", _fixture_record(5.0e6, 1.0))
    last = bench_mod._latest_run_record()
    assert last["path"].endswith("bench_good.json")

    # untimestamped round-4 names resolve by filename order
    _write(tmp_path, "bench_good.json", _fixture_record(5.0e6))
    _write(tmp_path, "bench_later_name.json", _fixture_record(5.5e6))
    last = bench_mod._latest_run_record()
    assert last["path"].endswith("bench_later_name.json")


def test_no_records_embeds_none(bench_mod, monkeypatch):
    rc, text = _run_main_unavailable(bench_mod, monkeypatch)
    rec = json.loads(text.strip())
    assert rec["detail"]["last_measured_stale"] is None


def test_overrun_kills_child_and_reports(bench_mod, monkeypatch, tmp_path):
    """A measurement that outlives the watchdog budget must be killed and
    reported as measurement_incomplete with the heartbeat embedded."""
    monkeypatch.setattr(bench_mod, "_probe_chip", lambda *a, **k: True)
    monkeypatch.setenv("BENCH_WALL_BUDGET", "2")
    monkeypatch.setenv("BENCH_PARENT_MARGIN", "0.1")
    _write(tmp_path, "bench_prior.json", _fixture_record(6.0e6, 50.0))

    real_mkstemp_paths = []

    def fake_spawn(budget_s):
        out_path = str(tmp_path / "out.json")
        hb_path = str(tmp_path / "hb.json")
        with open(hb_path, "w") as f:
            json.dump({"stage": "measure", "unix": time.time()}, f)
        proc = subprocess.Popen(
            [sys.executable, "-c", "import time; time.sleep(60)"],
            start_new_session=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        real_mkstemp_paths.append(proc)
        return proc, out_path, hb_path

    monkeypatch.setattr(bench_mod, "_spawn_child", fake_spawn)
    t0 = time.time()
    rc, text = _capture_main(bench_mod)
    wall = time.time() - t0
    assert rc == 1
    assert wall < 30, f"watchdog did not bound the run ({wall:.0f}s)"
    rec = json.loads(text.strip())
    assert rec["measurement_incomplete"] is True
    assert "overran" in rec["detail"]["note"]
    assert rec["detail"]["child_heartbeat"]["stage"] == "measure"
    assert rec["detail"]["last_measured_stale"]["record"]["value"] == 6.0e6
    # the child really died
    assert real_mkstemp_paths[0].poll() is not None


def test_child_failure_reports_error(bench_mod, monkeypatch, tmp_path):
    monkeypatch.setattr(bench_mod, "_probe_chip", lambda *a, **k: True)
    monkeypatch.setenv("BENCH_WALL_BUDGET", "30")
    monkeypatch.setenv("BENCH_PARENT_MARGIN", "0.1")

    def fake_spawn(budget_s):
        out_path = str(tmp_path / "out.json")
        hb_path = str(tmp_path / "hb.json")
        with open(out_path, "w") as f:
            json.dump({"error": "RuntimeError('boom')"}, f)
        proc = subprocess.Popen(
            [sys.executable, "-c", "import sys; print('bad', file=sys.stderr); sys.exit(1)"],
            start_new_session=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        return proc, out_path, hb_path

    monkeypatch.setattr(bench_mod, "_spawn_child", fake_spawn)
    rc, text = _capture_main(bench_mod)
    assert rc == 1
    rec = json.loads(text.strip())
    assert rec["measurement_incomplete"] is True
    assert rec["detail"]["child_error"] == "RuntimeError('boom')"
    assert "bad" in rec["detail"]["child_stderr_tail"]


def test_success_passes_child_record_through(bench_mod, monkeypatch, tmp_path):
    monkeypatch.setattr(bench_mod, "_probe_chip", lambda *a, **k: True)
    monkeypatch.setenv("BENCH_WALL_BUDGET", "30")
    monkeypatch.setenv("BENCH_PARENT_MARGIN", "0.1")
    good = _fixture_record(7.0e6, 300.0)

    def fake_spawn(budget_s):
        assert budget_s > 0
        out_path = str(tmp_path / "out.json")
        hb_path = str(tmp_path / "hb.json")
        with open(out_path, "w") as f:
            json.dump(good, f)
        proc = subprocess.Popen(
            [sys.executable, "-c", "pass"], start_new_session=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        return proc, out_path, hb_path

    monkeypatch.setattr(bench_mod, "_spawn_child", fake_spawn)
    rc, text = _capture_main(bench_mod)
    assert rc == 0
    rec = json.loads(text.strip())
    assert rec["value"] == 7.0e6
    assert "chip_unavailable" not in rec
    # the success is copied for future outage embedding
    saved = json.load(open(tmp_path / "runs" / "bench_last.json"))
    assert saved["value"] == 7.0e6


def test_probe_timeout_capped_by_remaining_budget(bench_mod, monkeypatch):
    """Per-probe timeout must shrink to the remaining probe budget (the
    advisor's ~690s-on-a-600s-budget overshoot)."""
    seen = []

    def probe(timeout_s):
        seen.append(timeout_s)
        time.sleep(0.05)
        return False

    monkeypatch.setattr(bench_mod, "_probe_chip", probe)
    monkeypatch.setenv("BENCH_PROBE_BUDGET", "0.3")
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "90")
    t0 = time.time()
    rc, _ = _capture_main(bench_mod)
    assert rc == 1
    assert time.time() - t0 < 5
    # capped at the remaining budget (with the 1 s subprocess floor), never
    # the full 90 s knob
    assert all(t <= 1.0 + 1e-6 for t in seen), seen
