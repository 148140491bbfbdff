"""CLI entry point — mirrors the reference's spark-submit-able run commands.

The reference drivers take ``(K, start_date, end_date, input, output)``
on the command line (``Query 1a/TopKNetProfitDriver.java:201-205``;
run commands in ``Software Documentation.pdf p.1``). This CLI exposes the
same surface for the native store_sales queries plus the whole registry
for the testdata pack.

Examples::

    python -m hadoop_hive_analysis_spark.cli q1a \
        --input /data/store_sales.dat --output /out/q1a -k 10 \
        --date-lo 2450816 --date-hi 2452642
    python -m hadoop_hive_analysis_spark.cli run q1a_top_suppliers_by_revenue \
        --sf-dir /root/testdata/sf0.01
    python -m hadoop_hive_analysis_spark.cli list
"""

from __future__ import annotations

import argparse
import sys

from .session import get_spark


def _add_native(sub: argparse._SubParsersAction, name: str, needs_store: bool) -> None:
    p = sub.add_parser(name, help=f"reference query {name} on native store_sales")
    p.add_argument("--input", required=True, help="pipe-delimited store_sales path")
    if needs_store:
        p.add_argument("--store", required=True, help="pipe-delimited store path")
    p.add_argument("--output", required=True, help="output dir (tab-separated text)")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--date-lo", type=int, default=2450816)
    p.add_argument("--date-hi", type=int, default=2452642)
    p.add_argument("--parquet", action="store_true", help="write parquet instead")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hadoop-hive-analysis-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for qname in ("q1a", "q1b", "q1c"):
        _add_native(sub, qname, needs_store=False)
    _add_native(sub, "q2", needs_store=True)

    runp = sub.add_parser("run", help="run any registry query on testdata")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--show", type=int, default=20)
    runp.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan"
    )

    sub.add_parser("list", help="list registry queries")

    ing = sub.add_parser(
        "ingest",
        help="convert pipe-delimited store_sales/store .dat to parquet "
        "(the migration on-ramp from the reference's HDFS text layout)",
    )
    ing.add_argument("table", choices=["store_sales", "store"])
    ing.add_argument("--input", required=True)
    ing.add_argument("--output", required=True)
    ing.add_argument(
        "--partition-by-date",
        action="store_true",
        help="partition store_sales by ss_sold_date_sk (enables partition "
        "pruning for the date-bounded query pack)",
    )

    args = ap.parse_args(argv)

    if args.cmd == "list":
        from .plans.registry import QUERIES

        for name, spec in sorted(QUERIES.items()):
            oracle = "oracle" if spec.oracle else "rows-only"
            print(f"{name:40s} [{oracle}] {spec.survey_ids}")
        return 0

    spark = get_spark("hha-cli")
    try:
        if args.cmd == "run":
            from .plans.registry import QUERIES

            if args.query not in QUERIES:
                print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
                return 2
            df = QUERIES[args.query].fn(spark, args.sf_dir)
            if args.explain:
                df.explain("formatted")
            df.show(args.show, truncate=False)
            return 0

        from .plans import reference_queries as rq
        from .sources.csv import read_store, read_store_sales
        from .sources.sinks import write_parquet, write_tab_text

        if args.cmd == "ingest":
            df = (
                read_store_sales(spark, args.input)
                if args.table == "store_sales"
                else read_store(spark, args.input)
            )
            part = (
                ["ss_sold_date_sk"]
                if (args.table == "store_sales" and args.partition_by_date)
                else None
            )
            write_parquet(df, args.output, partition_by=part)
            print(f"wrote {spark.read.parquet(args.output).count()} rows")
            return 0

        sales = read_store_sales(spark, args.input)
        if args.cmd == "q1a":
            out = rq.q1a_top_stores_by_profit(sales, args.k, args.date_lo, args.date_hi)
        elif args.cmd == "q1b":
            out = rq.q1b_top_items_by_quantity(sales, args.k, args.date_lo, args.date_hi)
        elif args.cmd == "q1c":
            out = rq.q1c_top_dates_by_profit(sales, args.k, args.date_lo, args.date_hi)
        else:
            store = read_store(spark, args.store)
            out = rq.q2_store_profit_employees(
                sales, store, args.k, args.date_lo, args.date_hi
            )
        if args.parquet:
            write_parquet(out, args.output)
        else:
            write_tab_text(out, args.output)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
