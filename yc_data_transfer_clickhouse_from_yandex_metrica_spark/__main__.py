"""CLI: run ClickHouse/YQ-dialect SQL over parquet tables.

    python -m yc_data_transfer_clickhouse_from_yandex_metrica_spark \
        [--data DIR] [--limit N] "SELECT ... FROM lineitem ..."

Every ``<name>.parquet`` in ``--data`` (default $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.01) registers as a table of that name; the query
goes through plans/chsql, so the ClickHouse dialect surface --
``toMonday``, ``indexOf``, ``countIf``, backtick aliases in WHERE/
HAVING, ``WITH TOTALS``, ``LIMIT 0,n``, per-branch UNION ALL limits --
works from the shell exactly as it does in the reference's DataLens
editor.  With no query argument, reads one from stdin.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="yc_data_transfer_clickhouse_from_yandex_metrica_spark",
        description="Run ClickHouse-dialect SQL over parquet tables.",
    )
    ap.add_argument("query", nargs="?", help="SQL text (default: read stdin)")
    ap.add_argument(
        "--data",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="directory of <table>.parquet files",
    )
    ap.add_argument("--limit", type=int, default=50, help="max rows to print")
    ap.add_argument(
        "--param",
        action="append",
        default=[],
        metavar="NAME=SQL",
        help="{{NAME}} substitution, e.g. interval_from=\"DATE '2024-01-01'\"",
    )
    args = ap.parse_args(argv)
    query = args.query or sys.stdin.read()
    if not query.strip():
        ap.error("empty query")
    params = {}
    for p in args.param:
        name, _, val = p.partition("=")
        if not _:
            ap.error(f"--param needs NAME=SQL, got {p!r}")
        params[name] = val

    from .plans import chsql
    from .session import get_spark

    spark = get_spark(app_name="chsql-cli", master="local[*]")
    spark.sparkContext.setLogLevel("ERROR")
    tables = {}
    for path in sorted(glob.glob(os.path.join(args.data, "*.parquet"))):
        name = os.path.splitext(os.path.basename(path))[0]
        tables[name] = spark.read.parquet(path)
    df = chsql.run_sql(spark, query, tables, params)
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
