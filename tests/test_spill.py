"""Memory-pressure receipts: heavy sort/window/agg plans must survive
the SPILL path with bit-identical results.

Shuffle-shape audits (tests/test_plans.py, SCALE.md) argue the plans
scale; this file demonstrates the orthogonal failure mode a 100 TB
operator actually hits — executor memory pressure — and freezes the
receipt the way the AQE-skew and bloom receipts are frozen:

- tools/spill_probe.py runs in its OWN JVM (spill knobs are
  JVM-start configs) with a 512m heap, memory.fraction=0.2, and the
  force-spill thresholds Spark's own test suite uses, so the external
  sorter and window buffer deterministically exercise spill;
- this test runs the SAME queries in the normal test session and
  compares row counts + sha256 value hashes — spilled and in-memory
  execution must be indistinguishable in output;
- for the sort and window queries the probe must report
  memoryBytesSpilled > 0 (the receipt that the spill path actually
  ran); the wide hash aggregate is asserted hash-stable under the
  same pressure (its map-side partials are WHY it needn't spill).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from spill_probe import QUERIES, SPILL_EXPECTED, row_hash  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def probe_results():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "spill_probe.py"), SF_DIR],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    rows = [
        json.loads(line)
        for line in out.stdout.splitlines()
        if line.startswith("{")
    ]
    return {r["query"]: r for r in rows}


def test_probe_covers_all_queries(probe_results):
    assert set(probe_results) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(SPILL_EXPECTED))
def test_spill_path_actually_ran(probe_results, name):
    r = probe_results[name]
    assert r["memoryBytesSpilled"] > 0, r


@pytest.mark.parametrize("name", QUERIES)
def test_spilled_results_match_in_memory(spark, probe_results, name):
    from mapreducegcp_spark.registry import all_queries

    n, digest = row_hash(all_queries()[name].fn(spark, SF_DIR))
    r = probe_results[name]
    assert (r["rows"], r["sha256"]) == (n, digest), (
        f"{name}: spilled execution diverged from in-memory "
        f"({r['rows']} rows / {r['sha256'][:12]} vs {n} / {digest[:12]})"
    )
