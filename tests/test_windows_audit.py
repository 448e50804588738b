"""Unpartitioned-window inventory (tools/windows_audit.py).

`WindowExec: No Partition Defined` single-partitions the window input;
that is only acceptable for bounded intermediates. The round-10
full-catalog sweep found 9 occurrences across 288 queries, each
justified in the tool's ALLOWLIST. These tests keep the inventory
honest: the known occurrences must still match their justification
(ungated, fast), the detector must actually flag a data-sized
occurrence (negative control), and the full catalog must stay clean
(gated sweep, same opt-in as the other scale receipts).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import windows_audit as wa  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

KNOWN = sorted({qn for qn, _ in wa.ALLOWLIST})


def test_known_unpartitioned_windows_match_allowlist(spark):
    found, errors = wa.audit(spark, SF_DIR, KNOWN)
    assert not errors, errors
    # every known query still has its (allowlisted) occurrence, and
    # nothing beyond the allowlist appeared in them
    assert sorted(found) == KNOWN, sorted(found)
    assert wa.check(found) == []


def test_detector_flags_data_sized_unpartitioned_window(spark):
    """Negative control: a global row_number over a data-sized table
    must be detected and must NOT match any allowlist entry."""
    from pyspark.sql import Window, functions as F

    df = spark.range(1000).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    sites = wa._window_sites(df)
    assert len(sites) == 1 and "row_number" in sites[0], sites
    assert wa.check({"some_new_query": sites}) == [
        ("some_new_query", sites[0])
    ]


def test_detector_sees_subquery_windows(spark):
    """Window nodes nested in expression subqueries must be walked
    too — a scalar subquery is where a global agg-via-window hides."""
    from pyspark.sql import functions as F

    spark.range(100).createOrReplaceTempView("wa_t")
    df = spark.sql(
        """
        SELECT id FROM wa_t
        WHERE id > (SELECT max(rn) - 100 FROM
                    (SELECT row_number() OVER (ORDER BY id) AS rn FROM wa_t))
        """
    )
    sites = wa._window_sites(df)
    assert any("row_number" in s for s in sites), sites


def test_plan_forest_overflow_raises_not_truncates(spark, monkeypatch):
    """Round-10 ADVICE: a plan forest deeper than the walk budget must
    surface as a per-query ERROR (the tests assert errors empty), not a
    silent break that passes the audit with unscanned plans."""
    spark.range(100).createOrReplaceTempView("wa_deep_t")
    df = spark.sql(
        "SELECT id FROM wa_deep_t WHERE id > (SELECT min(id) FROM wa_deep_t)"
        " AND id < (SELECT max(id) FROM wa_deep_t)"
    )
    monkeypatch.setattr(wa, "_PLAN_FOREST_CAP", 1)
    with pytest.raises(RuntimeError, match="plan forest exceeded"):
        list(wa._unpartitioned_windows(df))
    # and audit() converts the raise into a recorded per-query error
    monkeypatch.setattr(
        wa, "_window_sites", lambda _df: (_ for _ in ()).throw(RuntimeError("plan forest exceeded 1"))
    )
    _found, errors = wa.audit(spark, SF_DIR, ["wordcount"])
    assert errors and "plan forest exceeded" in errors[0][1]


def test_every_allowlist_entry_has_a_numeric_bound():
    """The measured-bound table (BOUNDS_100X) must cover the allowlist
    exactly — an allowlist entry without a numeric bound would regress
    to a prose-only claim."""
    assert set(wa.ALLOWLIST) == set(wa.BOUNDS_100X)


def test_allowlisted_window_inputs_within_bounds_small(spark):
    """The measurement machinery end-to-end at sf0.001: every
    allowlisted window's input row count is measured (child plan
    re-planned and counted) and sits within its stated bound."""
    rows = wa.measure(spark, SF_DIR)
    assert rows and all(r["ok"] for r in rows), [r for r in rows if not r["ok"]]
    # the seven cumsum offset tables (feature_quantile_bins joined the
    # family in round 12) measure EXACTLY layout._N_RANGE — pin that
    # the measurement reads the real intermediate, not a stub
    cumsum = [r for r in rows if r["bound_desc"] == "layout._N_RANGE"]
    assert len(cumsum) == 7 and all(r["measured_rows"] == wa._n_range() for r in cumsum)


@pytest.mark.skipif(
    os.environ.get("RUN_SCALE_PROBE") != "1",
    reason="full-catalog plan sweep; RUN_SCALE_PROBE=1 to run",
)
def test_full_catalog_has_no_unlisted_unpartitioned_windows(spark):
    found, errors = wa.audit(spark, SF_DIR)
    assert not errors, errors
    assert wa.check(found) == [], wa.check(found)


@pytest.mark.skipif(
    not (
        os.environ.get("RUN_SCALE_PROBE") == "1"
        and Path("/tmp/blowup/sf10").exists()
    ),
    reason="100x window-input measurement; RUN_SCALE_PROBE=1 and "
    "/tmp/blowup/sf10 (tools/blowup_probe.py --build --factor 100)",
)
def test_allowlisted_window_inputs_within_bounds_at_100x(spark):
    """Round-10 verdict ask #5: each of the 9 allowlisted unpartitioned
    windows' input row counts MEASURED at the 100x corpus against the
    stated bound (<= layout._N_RANGE offset rows / calendar days /
    months / broadcast-budget vocab) — the SCALE.md 'measured rows @
    100x' column, executable."""
    rows = wa.measure(spark, "/tmp/blowup/sf10")
    assert len(rows) == len(wa.ALLOWLIST)
    assert all(r["ok"] for r in rows), [r for r in rows if not r["ok"]]
