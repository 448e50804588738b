#!/usr/bin/env python
"""Parquet aggregate-pushdown probe — COUNT/MIN/MAX served from
row-group statistics instead of row scans.

Spark's parquet aggregate pushdown (`spark.sql.parquet.aggregatePushdown`)
only engages on the DataSource V2 read path, and
`spark.sql.sources.useV1SourceList` is honored at session BUILD time —
runtime `spark.conf.set` does not re-resolve the source. That makes
this un-registerable as a catalog query (the driver owns the session),
so it lives as a standalone probe: builds its own V2-configured
session, asserts `PushedAggregation` appears in the plan, and checks
the pushed results equal a full-scan recompute.

At 100 TB the difference is reading ~KBs of footer statistics per file
versus scanning every row — the free fast path for the
`SELECT count(*), min(ts), max(ts)` bookkeeping queries every pipeline
runs before a backfill.

    python tools/aggpush_probe.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import io
import contextlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("aggpush-probe")
        # V2 parquet read path (pushdown requirement) + the flag itself
        .config("spark.sql.sources.useV1SourceList", "")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = f"{args.sf_dir}/lineitem.parquet"

    aggs = [
        F.count("*").alias("n_rows"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    ]
    pushed = spark.read.parquet(path).agg(*aggs)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pushed.explain("formatted")
    plan = buf.getvalue()
    pushed_line = next(
        (l.strip() for l in plan.splitlines() if "PushedAggregation" in l), None
    )
    assert pushed_line and "COUNT(*)" in pushed_line, (
        "aggregate pushdown did not engage:\n" + plan[:2000]
    )

    # ground truth through a row-scanning plan (filter defeats pushdown)
    scan = (
        spark.read.parquet(path)
        .filter(F.col("l_quantity") >= F.lit(-1))  # always-true, kills pushdown
        .agg(*aggs)
    )
    p, s = pushed.collect()[0], scan.collect()[0]
    assert tuple(p) == tuple(s), (tuple(p), tuple(s))
    print(f"plan: {pushed_line}")
    print(f"values (pushed == scanned): {tuple(p)}")


if __name__ == "__main__":
    main()
