"""Command-line entry point — the engine as a usable tool.

The reference's user surface is a tiny script that calls
``initCluster`` / ``runMapRed`` / ``destroyCluster`` over XML-RPC
(Master/testMaster.py:8-12). This CLI is the Spark-native equivalent
of that "run my job from a shell" workflow, widened to the whole
catalog:

    python -m mapreducegcp_spark list [--tag TAG]
    python -m mapreducegcp_spark run QUERY [--sf-dir D] [--show N]
                                   [--output PATH --format parquet|json|csv]
    python -m mapreducegcp_spark explain QUERY [--sf-dir D]
    python -m mapreducegcp_spark oracle QUERY
    python -m mapreducegcp_spark sql "SELECT ..." [--sf-dir D] [--show N]
    python -m mapreducegcp_spark mapred INPUT [--app WordCount]
                                   [--mappers N --reducers N] [--output F]

``run`` writes through the DataFrame writer (executor-side, no driver
gather) when ``--output`` is given, otherwise shows the first rows.
``sql`` registers every catalog table as a temp view first, so ad-hoc
ANSI SQL over the data works out of the box. ``mapred`` drives the
reference-parity facade end to end: source classification (directory /
file / literal string, Master/Master.py:195-224), the named
application, merged JSON out.
"""

from __future__ import annotations

import argparse
import sys

from mapreducegcp_spark.session import get_spark, sf_dir_from_env


def _cmd_list(args) -> int:
    from mapreducegcp_spark.registry import all_queries

    for name, rq in sorted(all_queries().items()):
        if args.tag and args.tag not in rq.tags:
            continue
        doc = (rq.fn.__doc__ or "").strip().splitlines()
        first = doc[0] if doc else ""
        print(f"{name:40s} {first}")
    return 0


def _resolve(name: str):
    """Catalog lookup shared by run/explain/oracle: the RegisteredQuery,
    or None after printing the unknown-name error (exit code 2)."""
    from mapreducegcp_spark.registry import all_queries

    rq = all_queries().get(name)
    if rq is None:
        print(f"unknown query {name!r}; see `list`", file=sys.stderr)
    return rq


def _cmd_run(args) -> int:
    rq = _resolve(args.query)
    if rq is None:
        return 2
    spark = get_spark("mapreducegcp-cli")
    df = rq.fn(spark, args.sf_dir)
    if args.output:
        df.write.format(args.format).mode("overwrite").save(args.output)
        print(f"wrote {args.output} ({args.format})")
    else:
        df.show(args.show, truncate=False)
    return 0


def _cmd_explain(args) -> int:
    rq = _resolve(args.query)
    if rq is None:
        return 2
    spark = get_spark("mapreducegcp-cli")
    rq.fn(spark, args.sf_dir).explain("formatted")
    return 0


def _cmd_oracle(args) -> int:
    rq = _resolve(args.query)
    if rq is None:
        return 2
    if rq.oracle is None:
        print(f"{args.query} has no SQL oracle", file=sys.stderr)
        return 1
    print(rq.oracle.strip())
    return 0


def _cmd_sql(args) -> int:
    from mapreducegcp_spark.sources.catalog import TABLES, load_table

    spark = get_spark("mapreducegcp-cli")
    for t in TABLES:
        load_table(spark, args.sf_dir, t).createOrReplaceTempView(t)
    spark.sql(args.statement).show(args.show, truncate=False)
    return 0


def _cmd_mapred(args) -> int:
    from mapreducegcp_spark.plans.run_mapred import MapReduceEngine

    spark = get_spark("mapreducegcp-cli")
    eng = MapReduceEngine(spark)
    uid = eng.init_cluster(args.mappers, args.reducers)
    try:
        out = eng.run_mapred(
            uid, args.input, f"{args.app}Mapper", f"{args.app}Reducer"
        )
    finally:
        eng.destroy_cluster(uid)
    if args.output:
        with open(args.output, "w", encoding="utf-8") as fh:
            fh.write(out)
        print(f"wrote {args.output}")
    else:
        print(out)
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="python -m mapreducegcp_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("list", help="list registered queries")
    p.add_argument("--tag", help="filter by registry tag")
    p.set_defaults(fn=_cmd_list)

    p = sub.add_parser("run", help="run a catalog query")
    p.add_argument("query")
    p.add_argument("--sf-dir", default=sf_dir_from_env())
    p.add_argument("--show", type=int, default=20)
    p.add_argument("--output", help="write results here instead of showing")
    p.add_argument("--format", default="parquet", choices=["parquet", "json", "csv"])
    p.set_defaults(fn=_cmd_run)

    p = sub.add_parser("explain", help="print the formatted physical plan")
    p.add_argument("query")
    p.add_argument("--sf-dir", default=sf_dir_from_env())
    p.set_defaults(fn=_cmd_explain)

    p = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p.add_argument("query")
    p.set_defaults(fn=_cmd_oracle)

    p = sub.add_parser("sql", help="run ad-hoc Spark SQL over the tables")
    p.add_argument("statement")
    p.add_argument("--sf-dir", default=sf_dir_from_env())
    p.add_argument("--show", type=int, default=20)
    p.set_defaults(fn=_cmd_sql)

    p = sub.add_parser("mapred", help="run the reference-parity facade")
    p.add_argument("input", help="directory, file, or literal string corpus")
    p.add_argument("--app", default="WordCount", help="application name")
    p.add_argument("--mappers", type=int, default=4)
    p.add_argument("--reducers", type=int, default=2)
    p.add_argument("--output", help="write merged JSON here")
    p.set_defaults(fn=_cmd_mapred)

    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
