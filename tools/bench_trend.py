#!/usr/bin/env python
"""Cross-round bench adjudicator — automates the interference-vs-
regression call done by hand in rounds 3 and 5.

Diffs the last two ``BENCH_r{N}.json`` artifacts (and, when both are
committed, the ``BENCH_BREADTH.json`` content at each one's commit),
flags >1.5x movers, and cross-references ``git log`` for whether each
mover's implementing module changed between the artifacts:

- mover + module changed      -> real suspect, lists the commits
- mover + module untouched    -> measurement interference signature
  (the round-5 false alarm: 2.27x headline, zero relevant commits)

Per-query ``runs`` spread (recorded since round 6) sharpens the call:
a pass-A >> pass-B spread inside one artifact is external load landing
mid-run, not a plan change.

Usage:
    python tools/bench_trend.py                 # last two BENCH_r*.json
    python tools/bench_trend.py OLD.json NEW.json
    python tools/bench_trend.py --threshold 2.0
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

THRESHOLD = 1.5
MIN_BASE_SEC = 0.15  # ratios over sub-150ms baselines are timer noise


def _load_parsed(path: Path) -> dict:
    """Accept both the raw bench stdout object and the driver's
    wrapper ({"parsed": {...}, "tail": ...})."""
    doc = json.loads(path.read_text())
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    if "queries" not in doc:
        raise SystemExit(f"{path}: no 'queries' field")
    return doc


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args],
        capture_output=True,
        text=True,
        check=False,
    ).stdout.strip()


def _artifact_commit(path: Path) -> str | None:
    """Commit that last touched the artifact (empty for uncommitted)."""
    return _git("log", "-n1", "--format=%H", "--", path.name) or None


def _module_of(query: str) -> Path | None:
    """Repo-relative source file implementing a registered query."""
    try:
        from mapreducegcp_spark.registry import all_queries

        fn = all_queries()[query].fn
        mod = sys.modules.get(fn.__module__)
        f = Path(mod.__file__).resolve()
        return f.relative_to(REPO)
    except Exception:  # noqa: BLE001 — unmapped query is reported, not fatal
        return None


def _commits_touching(path: Path | None, since: str | None, until: str | None) -> list[str]:
    if path is None or since is None:
        return []
    out = _git("log", "--oneline", f"{since}..{until or 'HEAD'}", "--", str(path))
    return [ln for ln in out.splitlines() if ln]


def load_ratio_of(old: dict, new: dict) -> float | None:
    """Worst-case machine-load ratio between two bench artifacts, from
    their fixed-work probes: max over the single-thread and 8-thread
    calibration fields of (new's slowest sample / old's fastest).
    None when neither field is present in both (pre-round-7
    artifacts). > ~1.2 means the NEW capture ran on a busier box and
    movers at or under the ratio are load, not plan changes."""
    ratios = []
    for field in ("calibration_sec", "calibration_mt_sec"):
        c_old, c_new = old.get(field), new.get(field)
        if c_old and c_new and min(c_old) > 0:
            ratios.append(max(c_new) / min(c_old))
    return round(max(ratios), 2) if ratios else None


def _ilv_queries(ilv: dict, new_artifact: Path) -> tuple[dict, dict]:
    """Per-query interleaved mins for mover analysis. Pre-round-12
    embeds carried them inline; compact embeds name the artifact file,
    searched next to the NEW bench artifact first, then the repo root.
    Missing file -> empty dicts (headline ratio still adjudicates)."""
    if ilv.get("prev_queries") and ilv.get("head_queries"):
        return ilv["prev_queries"], ilv["head_queries"]
    fname = ilv.get("file")
    if not fname:
        return {}, {}
    for root in (new_artifact.resolve().parent, REPO):
        p = root / fname
        if p.exists():
            try:
                doc = json.loads(p.read_text())
            except (OSError, ValueError):
                continue
            return (
                doc.get("prev", {}).get("queries") or {},
                doc.get("head", {}).get("queries") or {},
            )
    return {}, {}


def _movers(old_q: dict, new_q: dict, threshold: float) -> list[dict]:
    out = []
    for name in sorted(set(old_q) & set(new_q)):
        a, b = old_q[name], new_q[name]
        if not (isinstance(a, (int, float)) and isinstance(b, (int, float))):
            continue
        if a < MIN_BASE_SEC or a <= 0 or b < 0:
            continue
        ratio = b / a
        if ratio > threshold or ratio < 1 / threshold:
            out.append({"query": name, "old": a, "new": b, "ratio": round(ratio, 2)})
    return sorted(out, key=lambda m: -m["ratio"])


def _spread_note(runs: dict, name: str) -> str:
    r = runs.get(name)
    if not (isinstance(r, list) and len(r) >= 2 and min(r) > 0):
        return ""
    spread = max(r) / min(r)
    if spread > 1.5:
        return f" runs={r} (spread {spread:.1f}x -> in-run interference)"
    return f" runs={r}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifacts", nargs="*", help="OLD.json NEW.json (default: last two BENCH_r*.json)")
    ap.add_argument("--threshold", type=float, default=THRESHOLD)
    args = ap.parse_args()

    if args.artifacts:
        if len(args.artifacts) != 2:
            raise SystemExit("pass exactly two artifact paths (or none)")
        old_p, new_p = (Path(a) for a in args.artifacts)
    else:
        rounds = sorted(
            REPO.glob("BENCH_r*.json"),
            key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
        )
        if len(rounds) < 2:
            raise SystemExit("need at least two BENCH_r*.json artifacts")
        old_p, new_p = rounds[-2], rounds[-1]

    old, new = _load_parsed(old_p), _load_parsed(new_p)
    old_commit = _artifact_commit(old_p)
    new_commit = _artifact_commit(new_p)  # None (-> HEAD) if uncommitted

    # READ THE INTERLEAVED FIELD FIRST (round-11): when the NEW artifact
    # embeds a same-session prev-vs-head interleaved capture, that is
    # the canonical headline ratio — the single-session totals below
    # carry ±10-15% session noise and are demoted to secondary. Movers
    # are judged on the interleaved per-query mins; since round 12 the
    # embed is compact (ratio/totals/staleness only — the full embed
    # overflowed the driver's tail capture in round 11), so the
    # per-query dicts are loaded from the interleave ARTIFACT FILE the
    # embed names, resolved next to the NEW artifact then in the repo.
    ilv = new.get("interleaved") or None
    if ilv and ilv.get("ratio") is not None:
        # three staleness states, not two (a non-git capture is
        # "unknown", not "stale"); an empty stale_source_paths under a
        # moved HEAD means only artifacts/docs changed — ratio valid
        if ilv.get("at_current_head") is True:
            stale_note = ""
        elif ilv.get("at_current_head") is False:
            src = ilv.get("stale_source_paths")
            if src is not None and len(src) == 0:
                stale_note = ", HEAD moved but engine/bench source untouched (ratio valid)"
            elif src:
                n = ilv.get("stale_source_n", len(src))
                stale_note = (
                    f", STALE vs current HEAD ({n} source path(s) changed:"
                    f" {', '.join(src[:3])}{', ...' if n > 3 else ''})"
                )
            else:
                stale_note = ", STALE vs current HEAD"
        else:
            stale_note = ", capture head unknown (non-git environment)"
        band = (
            f"; residual band {ilv['residual_band']}"
            if ilv.get("residual_band")
            else ""
        )
        print(
            f"INTERLEAVED (canonical): prev {ilv['prev_total_min']} -> "
            f"head {ilv['head_total_min']} s = {ilv['ratio']}x "
            f"(min-of-{ilv.get('runs')}, one session; "
            f"prev_rev {ilv.get('prev_rev')}, head {ilv.get('head_commit')}"
            f"{stale_note}){band}",
            file=sys.stderr,
        )
        prev_q, head_q = _ilv_queries(ilv, new_p)
        if prev_q and head_q:
            ilv_movers = _movers(prev_q, head_q, args.threshold)
            for m in ilv_movers:
                mod = _module_of(m["query"])
                commits = _commits_touching(mod, ilv.get("prev_rev"), None)
                tag = "SUSPECT" if commits else "noise? "
                print(
                    f"  interleaved {tag} {m['query']} "
                    f"{m['old']}->{m['new']}s ({m['ratio']}x) — "
                    f"{mod or 'unmapped'}"
                    f"{' changed: ' + '; '.join(commits[:3]) if commits else ' untouched'}",
                    file=sys.stderr,
                )
            if not ilv_movers:
                print("  interleaved: no movers over threshold", file=sys.stderr)

    headline = {
        "old": {"file": old_p.name, "total": old.get("value")},
        "new": {"file": new_p.name, "total": new.get("value")},
        "interleaved": {
            k: ilv.get(k)
            for k in ("ratio", "prev_total_min", "head_total_min",
                      "at_current_head", "residual_band")
            if k in ilv
        } if ilv else None,
    }
    # Machine-load adjudication from the artifacts themselves: each
    # bench records a fixed-work single-thread probe (bench._calibrate)
    # before the headliners and at the end. If the NEW capture's probe
    # ran k x slower than the OLD one's, the box itself was ~k x
    # loaded, and any mover with ratio <= ~k is load, not plan.
    load_ratio = load_ratio_of(old, new)
    headline["calibration"] = {
        "old": [old.get("calibration_sec"), old.get("calibration_mt_sec")],
        "new": [new.get("calibration_sec"), new.get("calibration_mt_sec")],
        "load_ratio": load_ratio,
    }
    movers = _movers(old["queries"], new["queries"], args.threshold)
    runs = new.get("runs", {})

    suspects, interference = [], []
    for m in movers:
        mod = _module_of(m["query"])
        commits = _commits_touching(mod, old_commit, new_commit)
        m["module"] = str(mod) if mod else None
        m["module_commits_since_old"] = commits
        m["spread"] = _spread_note(runs, m["query"]).strip()
        m["load_explained"] = bool(
            load_ratio and load_ratio > 1.2 and m["ratio"] <= load_ratio * 1.2
        )
        (suspects if commits else interference).append(m)

    print(json.dumps({"headline": headline, "movers": movers}, indent=1))
    total_ratio = (
        round(new["value"] / old["value"], 2)
        if old.get("value") and new.get("value")
        else None
    )
    load_note = (
        f"; NEW capture's fixed-work probe ran {load_ratio}x the OLD one's"
        f" ({'loaded box — movers at or under that ratio are load, not plans' if load_ratio and load_ratio > 1.2 else 'idle-comparable boxes'})"
        if load_ratio is not None
        else "; no calibration field in one or both artifacts (pre-round-7)"
    )
    session_tag = (
        "single-session (SECONDARY — interleaved above is canonical)"
        if ilv and ilv.get("ratio") is not None
        else "single-session"
    )
    print(
        f"\nsummary [{session_tag}]: headline {old.get('value')} -> {new.get('value')} s"
        f" ({total_ratio}x); {len(movers)} mover(s) over {args.threshold}x:"
        f" {len(suspects)} with code changes (REAL suspects),"
        f" {len(interference)} with untouched modules (interference"
        f" signature){load_note}",
        file=sys.stderr,
    )
    for m in suspects:
        print(
            f"  SUSPECT {m['query']} {m['old']}->{m['new']}s ({m['ratio']}x)"
            f" — {m['module']} changed:",
            file=sys.stderr,
        )
        for c in m["module_commits_since_old"]:
            print(f"    {c}", file=sys.stderr)
    for m in interference:
        print(
            f"  noise?  {m['query']} {m['old']}->{m['new']}s ({m['ratio']}x)"
            f" — {m['module'] or 'unmapped'} untouched{' ' + m['spread'] if m['spread'] else ''}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
