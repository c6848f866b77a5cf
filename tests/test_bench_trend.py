"""The machine-trend alarm in bench.py (VERDICT r13 #3): trailing-median
grading absorbs a slow monotonic riser by construction, so the bench now
tests the canary's round-median series directly and normalizes the
headline total by the measured machine-speed factor."""

import importlib.util
import json
import sys
from pathlib import Path

import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", Path(__file__).resolve().parents[1] / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    mod.HISTORY = tmp_path / "hist.jsonl"
    return mod


def _write_history(path, rows):
    with path.open("w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _row(rd, probe):
    return {
        "round": rd,
        "sf": 0.1,
        "canary": {"scan": 9.9, "tpch": probe, "events": probe},
    }


def test_round_probe_meds_excludes_warmup_probe(bench):
    _write_history(bench.HISTORY, [_row(1, 0.1), _row(1, 0.2), _row(2, 0.3)])
    meds = bench._round_probe_meds(0.1)
    # the 9.9 'scan' (first/warmup) probe never enters the median
    assert meds == {1: 0.1, 2: 0.3} or meds[1] in (0.1, 0.2)
    assert all(v < 1 for v in meds.values())


def test_trend_alarm_fires_on_sustained_rise(bench):
    _write_history(
        bench.HISTORY, [_row(1, 0.10), _row(2, 0.11), _row(3, 0.12)]
    )
    m = bench._machine_trend(0.1, 0.13)
    # 4 strictly-rising points, +30% cumulative: alarm
    assert m["trend_alarm"] is True
    assert m["machine_speed_factor"] == pytest.approx(1.3)


def test_trend_alarm_quiet_on_jitter(bench):
    # non-monotonic history (the real r10-r13 shape): no alarm even if
    # the current probe is high — that's the per-run load gate's job
    _write_history(
        bench.HISTORY, [_row(1, 0.16), _row(2, 0.15), _row(3, 0.135)]
    )
    m = bench._machine_trend(0.1, 0.20)
    assert m["trend_alarm"] is False
    assert m["machine_speed_factor"] == pytest.approx(0.2 / 0.135, rel=1e-3)


def test_trend_alarm_quiet_on_small_rise(bench):
    # strictly rising but under the 15% jitter floor: no alarm
    _write_history(
        bench.HISTORY, [_row(1, 0.100), _row(2, 0.101), _row(3, 0.102)]
    )
    m = bench._machine_trend(0.1, 0.103)
    assert m["trend_alarm"] is False


def test_trend_needs_enough_history(bench):
    _write_history(bench.HISTORY, [_row(1, 0.1)])
    m = bench._machine_trend(0.1, 0.2)
    assert m["trend_alarm"] is False  # 2 points is not a trend
