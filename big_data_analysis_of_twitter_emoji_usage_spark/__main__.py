"""CLI entry point — the engine's answer to the reference's stdin menu
(q1:37-64): run any catalog query by name over a scale-factor directory.

    python -m big_data_analysis_of_twitter_emoji_usage_spark list
    python -m big_data_analysis_of_twitter_emoji_usage_spark run q1_top_words \
        --sf /root/testdata/sf0.001 --limit 20
    python -m big_data_analysis_of_twitter_emoji_usage_spark run tpch_q3_topk --explain

`run` prints the top rows (the reference's show(), SURVEY §2.1 S4);
`--explain` prints the formatted physical plan instead of executing.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    from big_data_analysis_of_twitter_emoji_usage_spark.core import get_spark
    from big_data_analysis_of_twitter_emoji_usage_spark.plans.catalog import ORACLE_SQL, QUERIES

    p = argparse.ArgumentParser(prog="big_data_analysis_of_twitter_emoji_usage_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries")

    runp = sub.add_parser("run", help="run one catalog query")
    runp.add_argument("query", help="catalog query name (see `list`)")
    runp.add_argument(
        "--sf", default="/root/testdata/sf0.001", help="scale-factor dir"
    )
    runp.add_argument("--limit", type=int, default=20, help="rows to show")
    runp.add_argument(
        "--explain", action="store_true", help="print the physical plan"
    )
    runp.add_argument(
        "--master", default=None, help="Spark master (default local[$SPARK_GRAFT_CPUS])"
    )

    args = p.parse_args(argv)

    if args.cmd == "list":
        for name in QUERIES:
            tag = "" if name in ORACLE_SQL else "  [rows-only]"
            print(f"{name}{tag}")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query: {args.query!r} (try `list`)", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"cli:{args.query}", master=args.master)
    try:
        df = QUERIES[args.query](spark, args.sf)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
