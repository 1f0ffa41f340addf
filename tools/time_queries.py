"""Time a list of registry queries in one fresh JVM (noop sink).

Usage:
  python tools/time_queries.py [--reps N] query [query ...]

Prints one JSON line: {"host_probe_ms": ..., "times": {name: [r1, r2, ...]}}.

Round-12 measurement discipline: the sandbox host's effective CPU
speed swings ~10x on a seconds timescale (tools/host_probe.py), so
single wall-clock readings are meaningless.  A/B comparisons must
interleave runs of both trees (A B A B ...) and bracket each JVM with
the host probe; per-query reps inside one JVM separate plan cost from
JIT/codegen warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    reps = 2
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    if not args:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from tools.host_probe import probe

    probe_pre = probe(3)

    from nearscan_kafka_streams_spark.functions.dedup import release_cached
    from nearscan_kafka_streams_spark.queries import QUERIES
    from nearscan_kafka_streams_spark.session import get_spark

    spark = get_spark(app_name="time-queries")
    times: dict[str, list[float]] = {}
    for name in args:
        fn = QUERIES[name]
        runs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_cached()
        times[name] = runs
    probe_post = probe(3)
    print(
        json.dumps(
            {
                "host_probe_ms": [
                    round(probe_pre * 1000, 1),
                    round(probe_post * 1000, 1),
                ],
                "times": times,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
