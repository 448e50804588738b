"""Task-retry fault-tolerance receipts: injected task failures must
not change any query's output.

At 100 TB the unit of failure recovery is the task retry (preempted
executors, OOM-kills, disk faults); every operator must be
attempt-idempotent. tools/retry_probe.py runs in its own JVM with
``local[4, 4]`` (task maxFailures = 4 — a JVM-start setting, hence the
subprocess) and wraps every table scan in a mapInPandas stage whose
first attempt of partition 0 raises. This test pins:

- the scheduler really recorded failed tasks per query (a zero means
  the injection never fired and the receipt proves nothing);
- row count + sha256 value hash equal the normal session's — retried
  and clean execution are indistinguishable in output, including for
  the stateful-generator union-find engine.
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

from retry_probe import QUERIES, row_hash  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def probe_results():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "retry_probe.py"), SF_DIR],
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


@pytest.mark.parametrize("name", QUERIES)
def test_injection_actually_fired(probe_results, name):
    assert probe_results[name]["injected_failures"] >= 1, probe_results[name]


@pytest.mark.parametrize("name", QUERIES)
def test_retried_results_match_clean_run(spark, probe_results, name):
    from mapreducegcp_spark.registry import all_queries

    n, digest = row_hash(all_queries()[name].fn(spark, SF_DIR))
    r = probe_results[name]
    assert (r["rows"], r["sha256"]) == (n, digest), (
        f"{name}: retried execution diverged from clean run"
    )
