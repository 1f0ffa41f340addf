"""Streaming-shell tests: multi-micro-batch replay over file streams
(SURVEY (S)5 plan 2).  Verifies the streaming topology (watermarked
dedup -> chained stream-stream interval joins -> extraction) produces
the same transfers and final balances as the batch pipeline.
"""

from __future__ import annotations

import json
import shutil

import pytest

from nearscan_kafka_streams_spark.pipeline import run_batch
from nearscan_kafka_streams_spark.streaming.pipeline import run_fixture_pipeline
from tests.fixtures_near import build_fixture


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Write each input as MULTIPLE json files (out-of-order batches,
    duplicates in later files) to force multi-micro-batch replay."""
    root = tmp_path_factory.mktemp("stream_fixture")
    receipts, outcomes, actions, expected = build_fixture()

    def dump(rows, sub, n_files=3):
        d = root / sub
        d.mkdir()
        # reverse order: later blocks arrive first -> exercises
        # out-of-order handling (FIXTURES.md adversarial case 6)
        rows = list(reversed(rows))
        chunk = max(1, len(rows) // n_files)
        for i in range(0, len(rows), chunk):
            with open(d / f"part-{i:04d}.json", "w") as f:
                for row in rows[i : i + chunk]:
                    f.write(json.dumps({k: str(v) if k.endswith("timestamp") or k in
                                        ("included_in_block_timestamp",
                                         "executed_in_block_timestamp",
                                         "receipt_included_in_block_timestamp",
                                         "gas_burnt", "tokens_burnt", "shard_id")
                                        else v
                                        for k, v in row.items()}) + "\n")
        return d

    dump(receipts, "receipts")
    dump(outcomes, "outcomes")
    dump(actions, "actions")
    return root, expected


def test_streaming_matches_batch(spark, fixture_dir, tmp_path):
    root, expected = fixture_dir
    out_dir = str(tmp_path / "out")
    shutil.rmtree(out_dir, ignore_errors=True)

    balances = run_fixture_pipeline(spark, str(root), out_dir)
    got = {r["account"]: r["balance"] for r in balances.collect()}
    assert got == expected["balances"]

    transfers = spark.read.parquet(f"{out_dir}/token_transfer")
    assert transfers.count() == expected["transfer_rows"]


def test_streaming_equals_batch_pipeline(spark, fixture_dir, tmp_path):
    """Field-level equality of streaming vs batch final balances."""
    from tests.fixtures_near import to_dataframes

    root, _ = fixture_dir
    out_dir = str(tmp_path / "out2")
    streaming_balances = run_fixture_pipeline(spark, str(root), out_dir)

    from nearscan_kafka_streams_spark.config import PipelineConfig

    r, o, a, _ = to_dataframes(spark)
    # streaming keeps the tight 2s window (join-state pruning); compare
    # against the batch run configured identically
    batch_balances = run_batch(
        r, o, a, config=PipelineConfig(batch_join_tolerance="2 seconds")
    ).balances

    s_rows = {tuple(r) for r in streaming_balances.collect()}
    b_rows = {tuple(r) for r in batch_balances.collect()}
    assert s_rows == b_rows


def test_streaming_store_history_auditable(spark, fixture_dir, tmp_path):
    """retain_versions through the streaming shell: after the replay,
    the balance store's micro-batch history is readable as-of each
    retained commit and the cross-version changelog reconciles with
    the final state (the reference's compacted-topic audit)."""
    from nearscan_kafka_streams_spark.sinks.upsert import (
        list_store_versions,
        read_store_as_of,
        store_changelog,
    )

    root, expected = fixture_dir
    out_dir = str(tmp_path / "outv")
    final = run_fixture_pipeline(
        spark, str(root), out_dir, retain_versions=10
    )
    store = f"{out_dir}/token_balance_store"
    versions = list_store_versions(store)
    assert versions, "maxFilesPerTrigger=1 must commit retained versions"

    last = {
        r["account"]: r["balance"]
        for r in read_store_as_of(spark, store, versions[-1]).collect()
    }
    assert last == expected["balances"]
    assert last == {r["account"]: r["balance"] for r in final.collect()}

    if len(versions) > 1:
        # replaying the cross-run changelog over the first retained
        # snapshot must land exactly on the final state
        base = {
            r["account"]: r["balance"]
            for r in read_store_as_of(spark, store, versions[0]).collect()
        }
        for row in store_changelog(
            spark, store, versions[0], versions[-1]
        ).collect():
            if row["change"] == "delete":
                base.pop(row["account"])
            else:
                base[row["account"]] = row["after"]["balance"]
        assert base == expected["balances"]


def test_streaming_bridge_batches_coarse_replay(spark, fixture_dir, tmp_path):
    """bridge_batches=N replays the bridge in ~N balance micro-batches
    (not one per file) with an identical final store -- the bench's
    granularity for near_topology_stream."""
    import glob

    root, expected = fixture_dir
    out_dir = str(tmp_path / "outb")
    balances = run_fixture_pipeline(
        spark, str(root), out_dir, bridge_batches=2
    )
    got = {r["account"]: r["balance"] for r in balances.collect()}
    assert got == expected["balances"]

    n_files = len(glob.glob(f"{out_dir}/token_transfer/part-*"))
    n_batches = len(glob.glob(f"{out_dir}/ckpt_balances/offsets/*"))
    # genuinely multi-batch, but bounded by the requested count (+1:
    # availableNow may schedule one final drain/no-data batch)
    assert n_batches <= 3, (n_batches, n_files)
    if n_files >= 2:
        assert n_batches >= 2, (n_batches, n_files)
