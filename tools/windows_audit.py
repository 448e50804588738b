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
# (round 10): 9 occurrences / 288 queries, all bounded. Since round 11
# every entry also carries a NUMERIC bound in BOUNDS_100X, measured
# against the 100x corpus by ``measure()`` (gated test) — the bound is
# executable, not prose.
_TWO_PHASE_CUMSUM = (
    "two-phase cumsum offset table (round-4 rework): input is one "
    "pre-aggregated row per RANGE partition of the two-phase global "
    "ordering (layout._N_RANGE = 16 rows) regardless of data volume"
)
ALLOWLIST: dict[tuple[str, str], str] = {
    ("customer_gini_coefficient", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
    ("customer_pareto_deciles", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
    ("customer_rfm_segments", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
    ("feature_quantile_bins", r"windowspecdefinition\(pid# ASC"): _TWO_PHASE_CUMSUM,
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


def _n_range() -> int:
    from mapreducegcp_spark.operators.layout import _N_RANGE

    return _N_RANGE


# Numeric form of each allowlist justification, same keys: bound on the
# WINDOW INPUT row count, valid at ANY corpus volume (they are schema-,
# calendar- or constant-sized claims, which is exactly why the single
# partition is acceptable). ``measure()`` executes each window's child
# plan at a given corpus and compares. Daily/monthly series bounds are
# the TPC-H-ish calendar span (1992-1998 ~ 2.6k days / ~84 months) with
# slack; the vocab bound is a broadcast-budget row count (1M rows of
# (token, df) ~ 20 MB, the budget text_rarity_score's own broadcast
# join already commits to).
BOUNDS_100X: dict[tuple[str, str], tuple[str, object]] = {
    ("customer_gini_coefficient", r"windowspecdefinition\(pid# ASC"): ("layout._N_RANGE", _n_range),
    ("customer_pareto_deciles", r"windowspecdefinition\(pid# ASC"): ("layout._N_RANGE", _n_range),
    ("customer_rfm_segments", r"windowspecdefinition\(pid# ASC"): ("layout._N_RANGE", _n_range),
    ("feature_quantile_bins", r"windowspecdefinition\(pid# ASC"): ("layout._N_RANGE", _n_range),
    ("layout_compaction_plan", r"windowspecdefinition\(pid# ASC"): ("layout._N_RANGE", _n_range),
    ("order_global_rownum", r"windowspecdefinition\(pid# ASC"): ("layout._N_RANGE", _n_range),
    ("vocab_coverage_cutoff", r"windowspecdefinition\(pid# ASC"): ("layout._N_RANGE", _n_range),
    ("orders_open_backlog_sweep", r"windowspecdefinition\(day# ASC"): ("calendar days of corpus span (+slack)", 3000),
    ("timeseries_monthly_growth", r"windowspecdefinition\(ym# ASC"): ("calendar months of corpus span (+slack)", 120),
    ("text_rarity_score", r"windowspecdefinition\(specifiedwindowframe"): ("vocab rows within broadcast budget", 1_000_000),
}


# Walk budget for one query's plan forest (root plan + expression
# subqueries). Exceeding it RAISES — never silently truncates.
_PLAN_FOREST_CAP = 200


def _norm(sig: str) -> str:
    """Strip expr-ids/addresses so signatures are stable across runs."""
    sig = re.sub(r"#\d+L?", "#", sig)
    sig = re.sub(r"@[0-9a-f]+", "@", sig)
    return re.sub(r"\s+", " ", sig).strip()


def _walk(node):
    yield node
    for i in range(node.children().size()):
        yield from _walk(node.children().apply(i))


def _unpartitioned_windows(df):
    """Yield the unpartitioned Window LOGICAL nodes of the optimized
    plan, including plans nested in expression subqueries. A plan
    forest deeper than the defensive cap RAISES (recorded per-query by
    ``audit()``, asserted empty by the tests) — a silent truncation
    would let a query with a very deep subquery forest pass the audit
    with unscanned plans (round-10 ADVICE)."""
    qe = df._jdf.queryExecution()
    plans = [qe.optimizedPlan()]
    seen_plans = 0
    while plans:
        plan = plans.pop()
        seen_plans += 1
        if seen_plans > _PLAN_FOREST_CAP:  # defensive: no plan forest is this deep
            raise RuntimeError(
                f"plan forest exceeded {_PLAN_FOREST_CAP} subquery plans "
                "— audit would be incomplete; raise the cap after "
                "confirming the query's plan really is this deep"
            )
        for node in _walk(plan):
            subs = node.subqueries()
            for i in range(subs.size()):
                plans.append(subs.apply(i))
            if node.nodeName() != "Window":
                continue
            if node.partitionSpec().size() != 0:
                continue
            yield node


def _window_sites(df) -> list[str]:
    """Normalized signatures of unpartitioned Window nodes."""
    return [_norm(n.simpleString(200)) for n in _unpartitioned_windows(df)]


def _window_input_counts(spark, df) -> list[tuple[str, int]]:
    """(normalized signature, input row count) per unpartitioned Window
    node: the node's CHILD logical plan is re-planned as its own
    Dataset and counted, so the number is exactly the row set the
    single-partition window consumes at this corpus — no SQL-metric
    spelunking, no re-derivation of the query's internals."""
    out: list[tuple[str, int]] = []
    for node in _unpartitioned_windows(df):
        jds = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, node.child()
        )
        out.append((_norm(node.simpleString(200)), int(jds.count())))
    return out


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


def measure(spark, sf_dir: str, names=None) -> list[dict]:
    """Measure every allowlisted unpartitioned window's INPUT row count
    at ``sf_dir`` against its stated numeric bound (BOUNDS_100X). Run
    at the 100x blowup corpus by the gated test, this turns each
    allowlist justification from an asserted claim into a measured one:
    a window whose input turns out to grow with the data fails here
    long before it fails a production run. Returns one row per
    (query, window) with measured rows, bound, and ok."""
    from mapreducegcp_spark.registry import all_queries

    qs = all_queries()
    rows: list[dict] = []
    targets = list(names) if names else sorted({q for q, _ in ALLOWLIST})
    for name in targets:
        try:
            counts = _window_input_counts(spark, qs[name].fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — recorded, asserted by tests
            rows.append(
                {"query": name, "sig": None, "measured_rows": None,
                 "bound": None, "bound_desc": f"error: {type(e).__name__}: {e}",
                 "ok": False}
            )
            continue
        for sig, n in counts:
            key = next(
                (
                    (qn, pat)
                    for (qn, pat) in ALLOWLIST
                    if qn == name and re.search(pat, sig)
                ),
                None,
            )
            desc, bound = BOUNDS_100X.get(key, ("UNLISTED", None))
            bound_val = bound() if callable(bound) else bound
            rows.append(
                {
                    "query": name,
                    "sig": sig[:110],
                    "measured_rows": n,
                    "bound": bound_val,
                    "bound_desc": desc,
                    "ok": bound_val is not None and n <= bound_val,
                }
            )
    return rows


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
    ap.add_argument(
        "--measure",
        action="store_true",
        help="measure each allowlisted window's input rows at --sf-dir "
        "against its numeric bound (run with --sf-dir /tmp/blowup/sf10 "
        "for the 100x receipt) and print the SCALE.md table",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from mapreducegcp_spark.session import get_spark

    spark = get_spark("windows-audit", cpus=8, shuffle_partitions=8)

    if args.measure:
        rows = measure(spark, args.sf_dir, args.names or None)
        print("| query | window input rows (measured) | bound | bounded because |")
        print("|---|---|---|---|")
        bad = 0
        for r in sorted(rows, key=lambda r: (r["query"], r["sig"] or "")):
            why = next(
                (
                    w
                    for (qn, pat), w in ALLOWLIST.items()
                    if qn == r["query"] and r["sig"] and re.search(pat, r["sig"])
                ),
                r["bound_desc"],
            )
            mark = "" if r["ok"] else " **OVER BOUND**"
            print(
                f"| {r['query']} | {r['measured_rows']}{mark} "
                f"| {r['bound']} ({r['bound_desc']}) | {why} |"
            )
            bad += 0 if r["ok"] else 1
        print(f"\n{len(rows)} windows measured at {args.sf_dir}; {bad} over bound")
        return 1 if bad else 0

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
