"""Orientation adjudication for the adjacency-intersection triangle
plans on the heavy-tailed hub stress graph (round-12 seam execution).

Measures ``triangle_count_users`` wall time under each requested
orientation ("id" / "degree" / "auto") at each requested node count of
``bench.hub_graph_edges`` -- the deterministic power-law graph whose
max degree grows ~n/4 while edges stay ~2n.  This is the input
id-orientation is SUPER-linear on (a degree-D hub replicates its
D-element adjacency array onto D join rows: O(D^2) shuffled bytes),
so the id series is expected to blow past linear while the
degree-ordered series tracks ~n; the crossover pins the
``_ORIENT_GATE_MULT`` constant in queries/round5.py and the SCALE.md
adjudication row.

Usage:
  python tools/orient_bench.py [--reps N] [--sizes 5000,15000,50000]
                               [--orientations id,degree,auto]

Prints ONE JSON line:
  {"<orientation>@<n>": <min sec>, ..., "_reps": {...}}
Run SOLO on an otherwise-idle host (same discipline as
tools/stress_replay.py)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    reps = 2
    sizes = [5_000, 15_000, 50_000]
    orientations = ["id", "degree", "auto"]
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--reps":
            reps = int(args.pop(0))
        elif flag == "--sizes":
            sizes = [int(s) for s in args.pop(0).split(",")]
        elif flag == "--orientations":
            orientations = args.pop(0).split(",")
        else:
            sys.exit(f"unknown flag {flag}\n{__doc__}")
    if args:
        sys.exit(f"unexpected args {args}\n{__doc__}")

    from bench import hub_graph_edges
    from nearscan_kafka_streams_spark.functions.dedup import release_cached
    from nearscan_kafka_streams_spark.queries.round5 import (
        triangle_count_users,
    )
    from nearscan_kafka_streams_spark.session import get_spark

    spark = get_spark(
        app_name="nearscan-orient-bench",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g")
        },
    )
    # untimed warm pass (codegen compilation / committer init)
    triangle_count_users(
        spark, None, edges=hub_graph_edges(spark, 512)
    ).write.format("noop").mode("overwrite").save()
    release_cached()
    spark.catalog.clearCache()

    out: dict = {}
    all_reps: dict[str, list[float]] = {}
    for n in sizes:
        for orientation in orientations:
            key = f"{orientation}@{n}"
            runs: list[float] = []
            for _ in range(reps):
                t0 = time.perf_counter()
                triangle_count_users(
                    spark,
                    None,
                    edges=hub_graph_edges(spark, n),
                    orientation=orientation,
                ).write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
                release_cached()
                spark.catalog.clearCache()
            out[key] = min(runs)
            all_reps[key] = runs
    out["_reps"] = all_reps
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
