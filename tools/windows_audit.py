#!/usr/bin/env python
"""Inventory every unpartitioned Window across the whole catalog.

`WindowExec: No Partition Defined for Window operation!` means ALL rows
move to ONE partition for that window — fine for a bounded intermediate
(a 16-row offset table, a daily series, a pool-sized rerank), a scale
bug for anything data-sized. The plan tests pin the two queries that
were reworked in round 4 (two-phase cumsum), but nothing inventoried
the remaining warning sources — this tool does, for every registered
query, by walking the OPTIMIZED logical plan (including expression
subqueries) for Window nodes with an empty partitionSpec.

Each occurrence is normalized (expr-ids stripped) and must match the
ALLOWLIST below, which records WHY that single-partition window is
bounded. Exit code 1 if any unlisted occurrence appears, so the gated
test (tests/test_windows_audit.py) fails on a new data-sized
unpartitioned window.

    python tools/windows_audit.py [--sf-dir /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (query name, normalized window signature regex) -> why it is bounded.
# A signature lists the window functions of one Window node; one entry
# per (query, distinct node shape). Keep justifications concrete: name
# the bounded intermediate and its bound. Full-catalog sweep 2026-08-16
# (round 10): 9 occurrences / 288 queries, all bounded.
_TWO_PHASE_CUMSUM = (
    "two-phase cumsum offset table (round-4 rework): input is one "
    "pre-aggregated row per shuffle partition, <= spark.sql.shuffle."
    "partitions rows regardless of data volume"
)
ALLOWLIST: dict[tuple[str, str], str] = {
    ("customer_gini_coefficient", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
    ("customer_pareto_deciles", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
    ("customer_rfm_segments", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
    ("layout_compaction_plan", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
    ("order_global_rownum", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
    ("vocab_coverage_cutoff", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
    ("orders_open_backlog_sweep", r"windowspecdefinition\(day# ASC"): (
        "daily backlog series: input is one pre-aggregated delta row per "
        "calendar day — bounded by the date range (~2.5k days for the "
        "TPC-H-ish 7-year span), not by order volume"
    ),
    ("timeseries_monthly_growth", r"windowspecdefinition\(ym# ASC"): (
        "monthly revenue series: one pre-aggregated row per calendar "
        "month — bounded by the date range (~84 months), not by volume"
    ),
    ("text_rarity_score", r"windowspecdefinition\(specifiedwindowframe"): (
        "vocabulary grand-total rides the vocab rollup (one scan of the "
        "token stream instead of two); the very next operator broadcasts "
        "that same vocab table, so the single-partition step is bounded "
        "by the broadcast budget the query already requires"
    ),
}


def _norm(sig: str) -> str:
    """Strip expr-ids/addresses so signatures are stable across runs."""
    sig = re.sub(r"#\d+L?", "#", sig)
    sig = re.sub(r"@[0-9a-f]+", "@", sig)
    return re.sub(r"\s+", " ", sig).strip()


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


def _window_sites(df) -> list[str]:
    """Normalized signatures of unpartitioned Window nodes in the
    optimized plan, including plans nested in expression subqueries."""
    qe = df._jdf.queryExecution()
    plans = [qe.optimizedPlan()]
    sites: list[str] = []
    seen_plans = 0
    while plans:
        plan = plans.pop()
        seen_plans += 1
        if seen_plans > 200:  # defensive: no plan forest is this deep
            break
        for node in _walk(plan):
            subs = node.subqueries()
            for i in range(subs.size()):
                plans.append(subs.apply(i))
            if node.nodeName() != "Window":
                continue
            if node.partitionSpec().size() != 0:
                continue
            sites.append(_norm(node.simpleString(200)))
    return sites


def audit(spark, sf_dir: str, names=None) -> tuple[dict[str, list[str]], list]:
    from mapreducegcp_spark.registry import all_queries

    qs = all_queries()
    names = list(names) if names else list(qs)
    found: dict[str, list[str]] = {}
    errors: list[tuple[str, str]] = []
    for name in names:
        try:
            sites = _window_sites(qs[name].fn(spark, sf_dir))
        except Exception as e:  # plan unavailable (e.g. env-gated query)
            errors.append((name, f"{type(e).__name__}: {e}"))
            continue
        if sites:
            found[name] = sites
    return found, errors


def check(found: dict[str, list[str]]) -> list[tuple[str, str]]:
    """Occurrences not covered by the allowlist."""
    unlisted = []
    for name, sites in found.items():
        for sig in sites:
            for (qn, pat), _why in ALLOWLIST.items():
                if qn == name and re.search(pat, sig):
                    break
            else:
                unlisted.append((name, sig))
    return unlisted


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from mapreducegcp_spark.session import get_spark

    spark = get_spark("windows-audit", cpus=8, shuffle_partitions=8)
    found, errors = audit(spark, args.sf_dir, args.names or None)

    print("| query | unpartitioned window (normalized) | bounded because |")
    print("|---|---|---|")
    for name in sorted(found):
        for sig in found[name]:
            why = "**UNLISTED**"
            for (qn, pat), justification in ALLOWLIST.items():
                if qn == name and re.search(pat, sig):
                    why = justification
                    break
            print(f"| {name} | `{sig[:110]}` | {why} |")
    for name, err in errors:
        print(f"| {name} | (plan unavailable: {err[:80]}) | n/a |")

    unlisted = check(found)
    print(
        f"\n{sum(len(v) for v in found.values())} unpartitioned-window "
        f"occurrences across {len(found)} queries; {len(unlisted)} unlisted; "
        f"{len(errors)} plan errors"
    )
    return 1 if unlisted else 0


if __name__ == "__main__":
    sys.exit(main())
