"""Pure-function coverage for the bench adjudication tooling."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from bench_trend import _movers, load_ratio_of  # noqa: E402


def test_load_ratio_uses_worst_probe():
    """An oversubscribed box can leave one spare core (single-thread
    probe flat) while the 8-thread probe inflates — the ratio must
    take the worst of the two fields."""
    old = {"calibration_sec": [0.18, 0.18], "calibration_mt_sec": [0.20, 0.20]}
    new = {"calibration_sec": [0.19, 0.18], "calibration_mt_sec": [0.80, 0.75]}
    assert load_ratio_of(old, new) == 4.0  # 0.80 / 0.20


def test_load_ratio_none_for_pre_round7_artifacts():
    assert load_ratio_of({}, {"calibration_sec": [0.2, 0.2]}) is None
    assert load_ratio_of({"calibration_sec": [0.2, 0.2]}, {}) is None


def test_movers_ignore_sub_threshold_and_tiny_baselines():
    old = {"a": 1.0, "b": 0.05, "c": 2.0, "d": 1.0}
    new = {"a": 1.4, "b": 0.50, "c": 0.9, "d": 2.1}
    out = {m["query"]: m["ratio"] for m in _movers(old, new, 1.5)}
    # a: 1.4x < threshold; b: 10x but over a 50ms baseline (timer noise)
    assert out == {"d": 2.1, "c": 0.45}
