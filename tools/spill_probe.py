#!/usr/bin/env python
"""Memory-pressure receipt: run heavy sort/window/agg queries THROUGH
Spark's spill path and prove the results are unchanged.

Every scale argument in SCALE.md so far is shuffle-shape; this probe
demonstrates the orthogonal failure mode — executor memory pressure —
by forcing the external sorters to spill and value-hashing the output.
Spill knobs are JVM-start configs, so this runs as its OWN process
(tests/test_spill.py launches it via subprocess and compares the
hashes against an unconstrained session):

- ``spark.shuffle.spill.numElementsForceSpillThreshold`` /
  ``spark.sql.windowExec.buffer.spill.threshold`` /
  ``spark.sql.sortMergeJoinExec.buffer.spill.threshold`` — the knobs
  Spark's own test suite uses to force UnsafeExternalSorter and the
  window buffer through their spill paths deterministically (memory-
  pressure-only spill is machine- and timing-dependent: at sf0.1 a
  512m heap spills on some runs and not others);
- ``spark.memory.fraction=0.2`` + 512m driver heap — genuine pressure
  on top, so the run is not ONLY the force knob.

Per query it prints one JSON line:
    {"query": ..., "rows": N, "sha256": ..., "memoryBytesSpilled": N,
     "diskBytesSpilled": N}

Spill totals come from the AppStatusStore stage metrics (the same
numbers the UI's stage page shows), diffed around each query.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "order_global_rownum",        # global sort: range exchange + per-partition sort
    "window_topn_per_customer",   # window buffer + partition sort
    "agg_pricing_summary",        # wide hash aggregate (map-side partials keep it
                                  # in-memory even constrained — asserted hash-stable)
]

SPILL_EXPECTED = {"order_global_rownum", "window_topn_per_customer"}


def row_hash(df) -> tuple[int, str]:
    rows = sorted(repr(tuple(r)) for r in df.collect())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return len(rows), h.hexdigest()


def stage_spills(spark) -> tuple[int, int]:
    store = spark.sparkContext._jsc.sc().statusStore()
    jlist = spark._jvm.java.util.ArrayList()
    try:
        # Scala default args surface as stageList$default$N accessors;
        # arity is 5 in Spark 4.x. A py4j "method does not exist" here
        # means a Spark upgrade changed the signature — fail with the
        # fix location rather than a bare reflection error.
        args = [jlist] + [
            getattr(store, "stageList$default$%d" % i)() for i in range(2, 6)
        ]
        seq = store.stageList(*args)
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "AppStatusStore.stageList reflection failed — the Spark "
            "version changed its Scala default-arg arity; update the "
            "range(2, 6) in this helper"
        ) from e
    mem = disk = 0
    for i in range(seq.size()):
        s = seq.apply(i)
        mem += s.memoryBytesSpilled()
        disk += s.diskBytesSpilled()
    return mem, disk


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("spill-probe")
        .config("spark.driver.memory", "512m")
        .config("spark.memory.fraction", "0.2")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.shuffle.spill.numElementsForceSpillThreshold", "10000")
        .config("spark.sql.windowExec.buffer.spill.threshold", "10000")
        .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from mapreducegcp_spark.registry import all_queries

    qs = all_queries()
    for name in QUERIES:
        m0, d0 = stage_spills(spark)
        n, digest = row_hash(qs[name].fn(spark, sf_dir))
        m1, d1 = stage_spills(spark)
        print(
            json.dumps(
                {
                    "query": name,
                    "rows": n,
                    "sha256": digest,
                    "memoryBytesSpilled": m1 - m0,
                    "diskBytesSpilled": d1 - d0,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
