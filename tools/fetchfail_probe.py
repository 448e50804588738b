#!/usr/bin/env python
"""Shuffle-refetch fault-tolerance receipt: lose a map output AFTER
its stage completed and prove the query recovers through a real
FetchFailed -> map-stage-resubmission cycle with unchanged bytes.

tests/test_retry.py covers the TASK-attempt failure mode; the other
failure unit at 100 TB is losing a node's already-written shuffle
outputs (disk death, node preemption after the map stage finished).
Spark's recovery there is different machinery: the reduce task throws
FetchFailedException, the DAGScheduler marks the map outputs missing
and RESUBMITS the completed map stage for the lost partitions, then
re-runs the fetch. This probe executes that path deterministically:

- master ``local-cluster[2,2,1536]`` — real separate executor JVMs
  with their own block managers and shuffle files (plain ``local``
  cannot lose a fetch: reads are direct file access);
- per query, pin the physical RDD (``df.rdd``) and materialize every
  shuffle with ``count()`` — re-running an action on the SAME RDD
  reuses registered map outputs instead of replanning new shuffles;
- overwrite every ``.data`` file of the HIGHEST shuffle id with
  garbage (the result stage refetches exactly that shuffle; earlier
  shuffles stay intact so the resubmitted map stage reruns from them,
  a cascade only as deep as the damage — the 100 TB behavior);
- ``collect()`` again: the lz4 stream fails, shuffle-read wraps it in
  FetchFailedException (spark.shuffle.detectCorrupt), the stage
  resubmits, and the rows that come back must hash-equal a clean
  session's (tests/test_fetchfail.py compares).

Per query it prints one JSON line with rows, sha256, the delta of
scheduler-recorded failed tasks, and the delta of stage entries with
attemptId >= 1 (a resubmitted stage attempt). Zero deltas mean the
injection never fired and the receipt proves nothing — the test pins
both.

Queries chosen for shuffle-shape coverage: wordcount (pure-JVM
exchange + partial agg), tpch_q10_returned_items (broadcast joins
above an order-sized rollup shuffle), window_topn_per_customer (sort
window), join_nation_revenue (rollup below a dimension join), and
bpe_fertility_stats (Arrow pandas stages feeding an aggregation —
the Python boundary under refetch).

dedup_minhash_lsh was measured and EXCLUDED: its re-read is served
entirely from localCheckpoint blocks (every data file of all 4 of its
shuffles corrupted -> zero refetches, zero failed tasks, identical
output), i.e. lineage truncation also shields a replayed plan from
refetch storms — checkpoint-block loss is a different failure unit
(RDD recompute) already exercised by the retry probe's stateful
union-find query.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = [
    "wordcount",
    "tpch_q10_returned_items",
    "window_topn_per_customer",
    "join_nation_revenue",
    "bpe_fertility_stats",
]


def row_hash_rows(rows) -> tuple[int, str]:
    srows = sorted(repr(tuple(r)) for r in rows)
    h = hashlib.sha256()
    for r in srows:
        h.update(r.encode())
    return len(srows), h.hexdigest()


def _stage_stats(spark) -> tuple[int, int]:
    """(total failed tasks, stage entries with attemptId >= 1) from the
    AppStatusStore — the same reflection shape as retry/spill probes."""
    store = spark.sparkContext._jsc.sc().statusStore()
    jlist = spark._jvm.java.util.ArrayList()
    try:
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
    failed = 0
    resubmitted = 0
    for i in range(seq.size()):
        s = seq.apply(i)
        failed += s.numFailedTasks()
        if s.attemptId() >= 1:
            resubmitted += 1
    return failed, resubmitted


def _corrupt_shuffles() -> tuple[int, int]:
    """Overwrite every shuffle .data file across all executor
    block-manager dirs — whichever shuffle the result stage refetches,
    it hits damage; stages whose outputs live in localCheckpoint
    blocks recompute from those, so the resubmission cascade is only
    as deep as the actual lineage. Returns (shuffle ids, files hit)."""
    pats = [
        "/tmp/spark-*/executor-*/blockmgr-*/*/shuffle_*.data",
        "/tmp/spark-*/blockmgr-*/*/shuffle_*.data",
    ]
    files = [f for p in pats for f in glob.glob(p)]
    ids: set[int] = set()
    hit = 0
    for f in files:
        m = re.match(r"shuffle_(\d+)_", os.path.basename(f))
        if not m:
            continue
        sz = os.path.getsize(f)
        if sz == 0:
            continue
        with open(f, "r+b") as fh:
            fh.write(b"\xde\xad\xbe\xef" * max(1, sz // 8))
        ids.add(int(m.group(1)))
        hit += 1
    if not hit:
        raise RuntimeError("no shuffle .data files found to corrupt")
    return len(ids), hit


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    repo = str(Path(__file__).resolve().parent.parent)
    spark = (
        SparkSession.builder.master("local-cluster[2,2,1536]")
        .appName("fetchfail-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.shuffle.detectCorrupt", "true")
        # python workers on the executor JVMs must import this package
        .config("spark.executorEnv.PYTHONPATH", repo)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from mapreducegcp_spark.registry import all_queries

    qs = all_queries()
    for name in QUERIES:
        # pin the physical RDD: a second action on the SAME RDD reuses
        # the registered map outputs (a fresh df action would replan
        # brand-new shuffle ids and never refetch the damaged files)
        rdd = qs[name].fn(spark, sf_dir).rdd
        rdd.count()
        failed0, resub0 = _stage_stats(spark)
        n_ids, hit = _corrupt_shuffles()
        rows = rdd.collect()
        n, digest = row_hash_rows(rows)
        failed1, resub1 = _stage_stats(spark)
        print(
            json.dumps(
                {
                    "query": name,
                    "rows": n,
                    "sha256": digest,
                    "corrupted_shuffle_ids": n_ids,
                    "corrupted_files": hit,
                    "failed_task_delta": failed1 - failed0,
                    "resubmitted_stage_delta": resub1 - resub0,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
