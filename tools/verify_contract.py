#!/usr/bin/env python
"""One-command driver-contract verification from a FRESH process.

The runtime surface is the driver contract: a fresh Python process
imports ``__spark_entry__`` and calls ``entry(spark)``, ``queries()``,
``oracle_sql()``. `tools/check_oracles.py` runs the same strict compare
but with cwd=repo — which hides a real class of bug: anything
cloudpickled to Python workers BY REFERENCE (module-level DataSource
classes, UDF helpers) imports fine in-repo but fails from outside the
checkout (a round-3 bug was caught exactly this way). This tool
re-execs itself with cwd=/tmp so every run exercises the import path a
real consumer would use, then:

1. entry smoke: > 0 rows, stable schema;
2. contract: set(queries()) == set(oracle_sql());
3. strict compare (sorted column names, sorted repr'd row multisets —
   the driver's method) for the ROTATION FRONT (the stalest-evidence /
   recheck-tier queries the driver will check next) plus any names
   passed on the command line;
4. edge probes: nonexistent sf_dir raises cleanly, empty literal
   corpus yields empty wordcount, unknown table -> KeyError.

    python tools/verify_contract.py                 # front-12 + probes
    python tools/verify_contract.py --front 20
    python tools/verify_contract.py name1 name2 ... # specific queries
    python tools/verify_contract.py --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="extra queries to strict-compare")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--front", type=int, default=12,
                    help="how many rotation-front queries to compare")
    ap.add_argument("--_inner", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if not args._inner:
        # re-exec from /tmp: the whole point is a fresh process whose
        # cwd is NOT the checkout
        cmd = [sys.executable, str(Path(__file__).resolve()), "--_inner",
               "--sf-dir", args.sf_dir, "--front", str(args.front), *args.names]
        return subprocess.run(cmd, cwd="/tmp").returncode

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    report: dict = {"cwd": os.getcwd(), "sf_dir": args.sf_dir}

    rows = e.entry(spark).collect()
    report["entry_rows"] = len(rows)
    assert rows, "entry smoke: 0 rows"

    qs, oracles = e.queries(), e.oracle_sql()
    report["queries"] = len(qs)
    assert set(qs) == set(oracles), "queries()/oracle_sql() key mismatch"

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = Path(args.sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    sample = list(dict.fromkeys(list(qs)[: args.front] + args.names))
    fails: list[str] = []
    for name in sample:
        t0 = time.time()
        sdf = qs[name](spark, args.sf_dir).toPandas()
        ddf = con.execute(oracles[name]).fetchdf()
        cols = sorted(sdf.columns)
        ok = cols == sorted(ddf.columns)
        if ok:
            a = sorted(tuple(repr(v) for v in r) for r in sdf[cols].itertuples(index=False))
            b = sorted(tuple(repr(v) for v in r) for r in ddf[cols].itertuples(index=False))
            ok = a == b
        print(("PASS" if ok else "FAIL"),
              f"{name} ({len(sdf)} rows, {time.time() - t0:.1f}s)", flush=True)
        if not ok:
            fails.append(name)
    report["strict"] = {"pass": len(sample) - len(fails), "fail": fails}

    # edge probes
    probes = {}
    try:
        qs["wordcount"](spark, "/nonexistent_sf_dir").collect()
        probes["missing_sf_dir"] = "NO RAISE (bad)"
    except Exception as ex:  # noqa: BLE001 — any clean raise is the pass
        probes["missing_sf_dir"] = type(ex).__name__
    from mapreducegcp_spark.sources.catalog import docs_from_string, load_table

    probes["empty_literal_docs"] = docs_from_string(spark, "").count()
    try:
        load_table(spark, args.sf_dir, "nope")
        probes["unknown_table"] = "NO RAISE (bad)"
    except KeyError:
        probes["unknown_table"] = "KeyError"
    report["edge_probes"] = probes

    ok = not fails and "bad" not in str(probes)
    report["ok"] = ok
    print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
