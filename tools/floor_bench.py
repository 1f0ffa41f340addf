"""Per-query floor re-runs for bench-variance adjudication.

When a round's BENCH shows a timing-only WARN (plan shape identical,
time up), the adjudication needs the query's re-run FLOOR on a quiet
host, recorded explicitly -- not an inference from unrelated queries'
swings.  This tool times the named queries with bench.py's exact
discipline (one untimed warm-up scan, then min of N fully-independent
runs, caches dropped between) and prints one JSON line to paste into
SCALE.md's adjudication table.

Usage: python tools/floor_bench.py [--reps N] query [query ...]
       (sf dir from $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1;
        "token_pipeline" runs the flagship topology like bench.py does)

Run SOLO -- a concurrent Spark session on the same cores inflates
timings ~2x (bench.py header note).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    if not args:
        sys.exit(__doc__)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from nearscan_kafka_streams_spark.functions.dedup import release_cached
    from nearscan_kafka_streams_spark.queries import QUERIES
    from nearscan_kafka_streams_spark.session import get_spark

    spark = get_spark(
        app_name="nearscan-floor-bench",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g")
        },
    )
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()

    floors: dict[str, dict] = {}
    for name in args:
        runs: list[float] = []
        if name == "token_pipeline":
            from nearscan_kafka_streams_spark.pipeline import run_batch
            from nearscan_kafka_streams_spark.testgen import (
                generate_near_tables,
            )

            n_receipts = max(int(2_000_000 * float(sf)), 1000)
            r, o, a = generate_near_tables(spark, n_receipts)
            # untimed codegen warm-up, as in bench.py's flagship block
            run_batch(r, o, a).balances.write.format("noop").mode(
                "overwrite"
            ).save()
            for _ in range(reps):
                t0 = time.perf_counter()
                run_batch(r, o, a).balances.write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 3))
        else:
            fn = QUERIES[name]
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 3))
                release_cached()
                spark.catalog.clearCache()
        floors[name] = {"floor": min(runs), "runs": runs}
    spark.stop()
    sys.stdout.flush()
    print(json.dumps({"sf": sf, "reps": reps, "floors": floors}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
