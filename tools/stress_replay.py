"""Fresh-JVM arbiter for stress rerun anomalies.

The one-JVM bench occasionally hits a degraded window where an op runs
5-27x slow and an IN-JVM rerun cannot adjudicate it -- round 10
recorded dedup_minhash_lsh at 11.66 s first / 38.34 s on the in-JVM
rerun, the wrong direction for the artifact screen (SCALE.md).  This
tool rebuilds the DETERMINISTIC stress corpus (bench.build_stress_
thunks -- generate_documents/generate_embeddings are pure functions of
the row id) in a NEW process and times the identical thunk, so the
reading measures the computation, not the parent JVM's state.

Usage: python tools/stress_replay.py [--reps N] [--n-docs D --n-vecs V] op [op ...]

Prints ONE JSON line: {"<op>": <min sec>, ..., "_reps": {...}} --
bench.py's fresh-replay leg parses the final stdout line.  Run SOLO
apart from the (idle, blocked-on-subprocess) bench parent.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = list(sys.argv[1:])
    reps, n_docs, n_vecs = 2, 50_000, 20_000
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--reps":
            reps = int(args.pop(0))
        elif flag == "--n-docs":
            n_docs = int(args.pop(0))
        elif flag == "--n-vecs":
            n_vecs = int(args.pop(0))
        else:
            sys.exit(f"unknown flag {flag}\n{__doc__}")
    if not args:
        sys.exit(__doc__)

    from bench import build_stress_thunks
    from nearscan_kafka_streams_spark.functions.dedup import release_cached
    from nearscan_kafka_streams_spark.session import get_spark

    # Pin -Xms to the driver heap: a fresh JVM growing its heap under
    # the allocation pressure of a heavy-shuffle op thrashes GC
    # ergonomics for the WHOLE run, and the readings never converge
    # (round-12 adjudication: default-Xms solo reps of the jaccard 10x
    # thunk read 62.1 / 70.7 s where the warmed bench JVM reads ~23 s;
    # with -Xms pinned, rep 1 pays first-touch page faults (81 s) and
    # rep 2 lands at 17.1 s -- SCALE.md).
    mem = os.environ.get("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name="nearscan-stress-replay",
        extra_conf={
            "spark.driver.memory": mem,
            "spark.driver.extraJavaOptions": f"-Xms{mem}",
        },
    )
    wanted = set(args)
    out: dict = {}
    all_reps: dict[str, list[float]] = {}
    # tiny untimed warm pass per op (bench discipline: codegen
    # compilation / Python-worker spin-up out of the timed reading)
    _, _, warm_ops = build_stress_thunks(spark, 500, 256)
    # reject unknown names BEFORE the warm/timed passes: exiting after
    # minutes of measurement would discard every completed reading
    # (the thunk table is only knowable with a live session, so this
    # is the earliest the check can run)
    missing = wanted - {name for name, _ in warm_ops}
    if missing:
        sys.exit(f"unknown op(s): {sorted(missing)}")
    for name, thunk in warm_ops:
        if name in wanted:
            thunk().write.format("noop").mode("overwrite").save()
            release_cached()
            spark.catalog.clearCache()
    _, _, ops = build_stress_thunks(spark, n_docs, n_vecs)
    # ONE untimed FULL-SCALE pass per wanted op before the timed reps:
    # the tiny warm pass above compiles codegen but does not fault the
    # pinned heap or C2-compile the hot shuffle loops at real data
    # volume, and those fresh-process costs are NOT the computation
    # being adjudicated -- the in-bench readings this tool arbitrates
    # against all run in a long-lived, fully-warmed JVM.  The full
    # warm pass makes the fresh reading steady-state-comparable
    # (round-12: 62-81 s cold vs 17.1 s warmed for the identical
    # jaccard thunk); its wall is recorded under "_warm_full" so the
    # cold figure stays visible.
    warm_full: dict[str, float] = {}
    for name, thunk in ops:
        if name in wanted:
            t0 = time.perf_counter()
            thunk().write.format("noop").mode("overwrite").save()
            warm_full[name] = round(time.perf_counter() - t0, 3)
            release_cached()
            spark.catalog.clearCache()
    for name, thunk in ops:
        if name not in wanted:
            continue
        runs: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            thunk().write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            release_cached()
            spark.catalog.clearCache()
        out[name] = min(runs)
        all_reps[name] = runs
    out["_reps"] = all_reps
    out["_warm_full"] = warm_full
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
