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


def _ilv_doc(round_n=11, head_commit="h" * 40):
    return {
        "method": "interleaved min-of-N, one box, one session",
        "round": round_n,
        "prev_rev": "p" * 40,
        "head_commit": head_commit,
        "runs": 3,
        "prev": {"queries": {"q1": 1.0, "q2": 2.0}, "total_min": 3.0},
        "head": {"queries": {"q1": 1.1, "q2": 1.9}, "total_min": 3.0},
        "ratio": 1.0,
    }


def test_bench_embeds_newest_round_format_interleave(tmp_path):
    """bench.py must embed the NEWEST round-format interleave artifact
    (skipping pre-round-11 ad-hoc captures without a ratio) and flag a
    capture whose head_commit is not the current HEAD as stale."""
    import json

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import _interleaved_field

    # ad-hoc r10-format artifact (no ratio) must be skipped
    (tmp_path / "BENCH_INTERLEAVE_r10.json").write_text(json.dumps({"worktree": {}}))
    assert _interleaved_field(tmp_path) is None
    (tmp_path / "BENCH_INTERLEAVE_r11.json").write_text(json.dumps(_ilv_doc()))
    got = _interleaved_field(tmp_path)
    assert got["file"] == "BENCH_INTERLEAVE_r11.json"
    assert got["ratio"] == 1.0 and got["round"] == 11
    assert got["prev_queries"] == {"q1": 1.0, "q2": 2.0}
    # this tmp artifact's fake head_commit cannot match the repo HEAD —
    # and the fake commit isn't a real object, so the source-drift diff
    # stays None rather than inventing a path list
    assert got["at_current_head"] is False
    assert got["stale_source_paths"] is None


def test_interleave_round_mode_resolves_last_boundary():
    """--round compares against the DRIVER's last round-boundary
    commit — same primitive the registry's recheck tier uses. Skips on
    a fresh clone without driver history."""
    import subprocess

    import pytest

    from bench_interleave import last_round_boundary

    rev = last_round_boundary()
    if not rev:
        pytest.skip("no round-boundary commit in this checkout (fresh clone)")
    repo = Path(__file__).resolve().parent.parent
    subject = subprocess.run(
        ["git", "-C", str(repo), "log", "-n1", "--format=%s", rev],
        capture_output=True, text=True,
    ).stdout.strip()
    assert subject.startswith("round ") and ":" in subject


def test_trend_reads_interleaved_field_first(tmp_path):
    """With an embedded interleave, bench_trend's canonical headline is
    the same-session ratio; the single-session comparison is marked
    secondary. Exercised through the CLI (the adjudication path the
    round workflow runs)."""
    import json
    import subprocess

    repo = Path(__file__).resolve().parent.parent
    old = {"value": 10.0, "queries": {"q1": 5.0, "q2": 5.0}}
    new = {
        "value": 14.0,  # noisy single-session 1.4x...
        "queries": {"q1": 7.0, "q2": 7.0},
        "interleaved": {  # ...but interleaved says 1.0x
            "ratio": 1.0,
            "runs": 3,
            "prev_total_min": 3.0,
            "head_total_min": 3.0,
            "prev_rev": "p" * 12,
            "head_commit": "h" * 12,
            "at_current_head": True,
            "prev_queries": {"q1": 1.5, "q2": 1.5},
            "head_queries": {"q1": 1.5, "q2": 1.5},
        },
    }
    po, pn = tmp_path / "OLD.json", tmp_path / "NEW.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "bench_trend.py"), str(po), str(pn)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "INTERLEAVED (canonical)" in proc.stderr
    assert "no movers over threshold" in proc.stderr
    assert "SECONDARY" in proc.stderr
    out = json.loads(proc.stdout)
    assert out["headline"]["interleaved"]["ratio"] == 1.0
