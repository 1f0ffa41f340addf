"""Run any registry query from the command line.

Usage:
  python tools/run_query.py <query_name> [sf_dir] [--plan] [--limit N]
  python tools/run_query.py --list [filter]

Examples:
  python tools/run_query.py q1_pricing_summary
  python tools/run_query.py dedup_minhash_lsh /root/testdata/sf0.1 --plan
  python tools/run_query.py --list dedup
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if not args or args[0] in ("-h", "--help"):
        print(__doc__)
        return 0

    from nearscan_kafka_streams_spark.queries import ORACLES, QUERIES

    if args[0] == "--list":
        needle = args[1].lower() if len(args) > 1 else ""
        for name in QUERIES:
            if needle in name.lower():
                tag = "oracle" if name in ORACLES else "rows-only"
                print(f"{name}  [{tag}]")
        return 0

    name = args[0]
    if name not in QUERIES:
        close = [q for q in QUERIES if name.lower() in q.lower()]
        print(f"unknown query {name!r}." + (f" did you mean: {close}" if close else ""))
        return 2
    sf_dir = next(
        (a for a in args[1:] if not a.startswith("--")),
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    show_plan = "--plan" in args
    limit = 20
    if "--limit" in args:
        limit = int(args[args.index("--limit") + 1])

    from nearscan_kafka_streams_spark.session import get_spark

    spark = get_spark(app_name=f"run-{name}")
    df = QUERIES[name](spark, sf_dir)
    df.show(limit, truncate=False)
    print(f"rows: {df.count()}")
    if show_plan:
        df.explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
