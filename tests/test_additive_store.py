"""Additive incremental aggregate maintenance on the bucketed store."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.sinks.upsert import (
    foreach_batch_additive,
    read_store,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "n", "amount"])


def test_additive_equals_full_recompute(spark, tmp_path):
    store = str(tmp_path / "agg")
    merge = foreach_batch_additive(
        "user_id", store, ["n", "amount"], num_buckets=8
    )
    batches = [
        [(1, 1, 10), (2, 1, 5)],
        [(1, 2, 7), (3, 1, 1)],
        [(2, 1, 2), (3, 4, 4), (4, 1, 9)],
    ]
    for i, rows in enumerate(batches):
        merge(_batch(spark, rows), i)

    got = {
        r["user_id"]: (r["n"], r["amount"])
        for r in read_store(spark, store).collect()
    }
    flat = [row for rows in batches for row in rows]
    want = {}
    for uid, n, amount in flat:
        cur = want.get(uid, (0, 0))
        want[uid] = (cur[0] + n, cur[1] + amount)
    assert got == want


def test_replay_of_committed_batch_is_skipped(spark, tmp_path):
    """foreachBatch may re-deliver a batch after a sink-side success;
    addition is not idempotent, so the manifest version gates it."""
    store = str(tmp_path / "agg2")
    merge = foreach_batch_additive("user_id", store, ["n", "amount"])
    merge(_batch(spark, [(1, 1, 10)]), 0)
    merge(_batch(spark, [(1, 5, 50)]), 1)
    before = read_store(spark, store).collect()
    merge(_batch(spark, [(1, 5, 50)]), 1)  # duplicate delivery
    merge(_batch(spark, [(1, 99, 99)]), 0)  # stale replay
    after = read_store(spark, store).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))
    assert after[0]["n"] == 6 and after[0]["amount"] == 60


def test_only_touched_buckets_rewritten(spark, tmp_path):
    store = str(tmp_path / "agg3")
    merge = foreach_batch_additive(
        "user_id", store, ["n", "amount"], num_buckets=16
    )
    merge(_batch(spark, [(u, 1, 1) for u in range(40)]), 0)
    gens_before = {d for d in os.listdir(store) if d.startswith("gen-")}
    # one key -> at most one bucket touched in the new generation
    merge(_batch(spark, [(7, 1, 1)]), 1)
    new_gen = [
        d
        for d in os.listdir(store)
        if d.startswith("gen-") and d not in gens_before
    ]
    assert len(new_gen) == 1
    bucket_dirs = [
        d
        for d in os.listdir(os.path.join(store, new_gen[0]))
        if d.startswith("_bucket=")
    ]
    assert len(bucket_dirs) == 1
    # and the store still sums correctly
    row = (
        read_store(spark, store)
        .where(F.col("user_id") == 7)
        .first()
    )
    assert row["n"] == 2


def test_additive_random_batches_property(spark, tmp_path):
    """Hypothesis-style randomized check (seeded, deterministic): for
    arbitrary batch splits and key collisions, the store equals the
    one-shot aggregate of everything applied."""
    import random

    rng = random.Random(42)
    store = str(tmp_path / "agg_prop")
    merge = foreach_batch_additive(
        "user_id", store, ["n", "amount"], num_buckets=4
    )
    want: dict[int, tuple[int, int]] = {}
    bid = 0
    for _ in range(5):
        rows = [
            (rng.randrange(6), rng.randrange(1, 4), rng.randrange(100))
            for _ in range(rng.randrange(1, 8))
        ]
        for uid, n, amount in rows:
            cur = want.get(uid, (0, 0))
            want[uid] = (cur[0] + n, cur[1] + amount)
        merge(_batch(spark, rows), bid)
        bid += 1
        # occasional duplicate delivery of the batch just committed:
        # must be a no-op
        if rng.random() < 0.5:
            merge(_batch(spark, rows), bid - 1)

    got = {
        r["user_id"]: (r["n"], r["amount"])
        for r in read_store(spark, store).collect()
    }
    assert got == want


def test_additive_store_survives_compaction_and_further_merges(spark, tmp_path):
    """compact_store works on additive stores unchanged (it rewrites
    the manifest's consistent view), and merges continue correctly
    after the rewrite."""
    from nearscan_kafka_streams_spark.sinks.upsert import compact_store

    store = str(tmp_path / "agg_compact")
    merge = foreach_batch_additive(
        "user_id", store, ["n", "amount"], num_buckets=4
    )
    merge(_batch(spark, [(1, 1, 10), (2, 2, 20)]), 0)
    merge(_batch(spark, [(1, 3, 30), (3, 1, 5)]), 1)
    compact_store(spark, store, num_buckets=2)  # also re-buckets
    merge(_batch(spark, [(2, 1, 1)]), 2)
    got = {
        r["user_id"]: (r["n"], r["amount"])
        for r in read_store(spark, store).collect()
    }
    assert got == {1: (4, 40), 2: (3, 21), 3: (1, 5)}
