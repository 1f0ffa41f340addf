"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line as the FINAL line of stdout:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Per-query plan fingerprints and any per-query errors are written to a
side file (BENCH_PLANS_r{NN}.json next to this script) instead of the
stdout line: the driver keeps only a bounded tail of stdout, so the
summary line must stay small and must come last.

Headline set: the scan/join/agg core + one representative from each
north-star family (text, dedup, ANN) -- the queries whose plans
exercise every physical path (broadcast join, SMJ, hash agg, window,
explode, higher-order functions, Pandas UDF).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q18_large_orders",
    "broadcast_dim_join",
    "pivot_orders",
    "unpivot_lineitem",
    "percentile_acctbal",
    "window_rank_orders",
    "running_balance_events",
    "interval_join_events",
    "flatmap_legs_events",
    "tumbling_window_events",
    "sessionize_events",
    "text_quality_score",
    "text_fingerprint",
    "text_repetition",
    "text_scrub",
    "vocab_topk",
    "token_budget_shards",
    "profile_orders",
    "quality_model_score",
    "decontaminate_documents",
    "bpe_token_stats",
    "ann_pq_cosine",
    "dedup_exact_documents",
    "dedup_winnowed_spans",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_bruteforce_cosine",
    "ann_ivf_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from nearscan_kafka_streams_spark.queries import QUERIES
    from nearscan_kafka_streams_spark.session import get_spark

    spark = get_spark(app_name="nearscan-bench")
    # warm-up: one scan + one shuffle + one noop write so JVM startup,
    # codegen compilation and committer init are not attributed to the
    # first timed queries
    warm = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode(
        "overwrite"
    ).save()

    from nearscan_kafka_streams_spark.functions.dedup import release_cached

    from nearscan_kafka_streams_spark.plans.explain import plan_summary

    timings: dict[str, float] = {}
    plans: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        # one failing query must not sink the suite: record the error,
        # keep benching, still emit the JSON line (round-2 lesson: a
        # single AnalysisException cost the whole round's numbers)
        try:
            # materialize fully but keep results distributed (no driver pull)
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            # plan fingerprint AFTER the run (plan construction may persist
            # intermediates the summary would otherwise re-trigger)
            plans[name] = plan_summary(df)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        finally:
            # free any LSH intermediates so later queries get full memory
            release_cached()

    # flagship: the reference's own topology end-to-end (dedup -> 3-way
    # join -> JSON flat-map -> balance agg) over generated NEAR-shaped
    # input scaled to the sf (sf0.1 -> 200k receipts + 5% duplicates)
    from nearscan_kafka_streams_spark.pipeline import run_batch
    from nearscan_kafka_streams_spark.testgen import generate_near_tables

    try:
        n_receipts = max(int(2_000_000 * float(sf)), 1000)
        r, o, a = generate_near_tables(spark, n_receipts)
        # one untimed run first: the timed number is steady-state topology
        # latency, not whole-stage-codegen compilation for this plan (which
        # otherwise varies with suite ordering run-to-run)
        run_batch(r, o, a).balances.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        out = run_batch(r, o, a)
        out.balances.write.format("noop").mode("overwrite").save()
        timings["token_pipeline"] = round(time.perf_counter() - t0, 3)
    except Exception as exc:  # noqa: BLE001
        errors["token_pipeline"] = f"{type(exc).__name__}: {exc}"[:500]

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline-suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        # keep the stdout line small: error COUNT inline, details in the
        # side file
        result["error_count"] = len(errors)

    # plans + full error strings go to a side file so the compact summary
    # is the only (and last) stdout line
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    round_n = 1 + max(
        (
            int(f[len("BENCH_r") : -len(".json")])
            for f in os.listdir(repo_dir)
            if f.startswith("BENCH_r") and f.endswith(".json")
            and f[len("BENCH_r") : -len(".json")].isdigit()
        ),
        default=0,
    )
    side = {"queries": timings, "plans": plans, "errors": errors, "sf": result["sf"]}
    side_path = os.path.join(repo_dir, f"BENCH_PLANS_r{round_n:02d}.json")
    with open(side_path, "w") as fh:
        json.dump(side, fh, indent=1)

    spark.stop()
    # FINAL stdout line, by itself -- the driver tail-parses stdout
    sys.stdout.flush()
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()
