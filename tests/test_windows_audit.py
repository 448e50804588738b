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


@pytest.mark.skipif(
    os.environ.get("RUN_SCALE_PROBE") != "1",
    reason="full-catalog plan sweep; RUN_SCALE_PROBE=1 to run",
)
def test_full_catalog_has_no_unlisted_unpartitioned_windows(spark):
    found, errors = wa.audit(spark, SF_DIR)
    assert not errors, errors
    assert wa.check(found) == [], wa.check(found)
