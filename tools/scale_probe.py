#!/usr/bin/env python
"""Empirical scaling probe: run representative queries at 1x and 10x
data volume and report the wall-clock ratio.

The 10x corpus is built in-memory by unioning ten key-offset copies of
the sf tables (join keys offset consistently, so join/group cardinality
scales linearly — the honest way to replicate). A plan whose cost is
linear in input shows a ratio near 10 on a fixed-size cluster; a plan
hiding an O(n^2) step or a driver-side bottleneck shows much worse.
Paste the table into SCALE.md.

    python tools/scale_probe.py [--sf-dir /root/testdata/sf0.1] [--factor 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducegcp_spark.session import get_spark

OFFSET = 10_000_000_000

# query name -> (operator module, offset key columns per table)
PROBES = {
    "wordcount": {"documents": ["doc_id"]},
    "agg_pricing_summary": {"lineitem": []},
    "join_nation_revenue": {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
    },
    "sessionize_events": {"events": ["event_id", "user_id"]},
    "dedup_exact": {"documents": ["doc_id"]},
}


def replicate(df: DataFrame, keys: list[str], factor: int) -> DataFrame:
    parts = []
    for i in range(factor):
        p = df
        for k in keys:
            p = p.withColumn(k, F.col(k) + F.lit(i * OFFSET))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(df: DataFrame) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("scale-probe")
    from mapreducegcp_spark.registry import all_queries
    import mapreducegcp_spark.sources.catalog as catalog

    qs = all_queries()
    base_load = catalog.load_table

    print(f"| query | t_1x (s) | t_{args.factor}x (s) | ratio |")
    print("|---|---|---|---|")
    for name, tables in PROBES.items():
        q = qs[name]
        mod = sys.modules[q.fn.__module__]

        # warm + 1x (best of 2)
        t1 = min(timed(q.fn(spark, args.sf_dir)) for _ in range(2))

        def scaled_load(spark_, sf_dir_, table_):
            df = base_load(spark_, sf_dir_, table_)
            if table_ in tables:
                return replicate(df, tables[table_], args.factor)
            return df

        mod.load_table = scaled_load
        try:
            tN = min(timed(q.fn(spark, args.sf_dir)) for _ in range(2))
        finally:
            mod.load_table = base_load
        print(f"| `{name}` | {t1:.2f} | {tN:.2f} | {tN / t1:.1f} |")


if __name__ == "__main__":
    main()
