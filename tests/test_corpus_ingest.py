"""Streaming corpus ingest: cleaning parity with the batch path and
cross-micro-batch fingerprint dedup (the streaming training-data
pipeline, streaming/corpus.py)."""

from __future__ import annotations

import json

from nearscan_kafka_streams_spark.streaming.corpus import (
    clean_documents,
    run_corpus_ingest,
)

DOCS_A = [
    {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog again", "source": "a"},
    {"doc_id": 2, "text": "x", "source": "a"},  # low quality: dropped
    {"doc_id": 3, "text": "the rain in spain stays mainly on the plain today", "source": "a"},
]
DOCS_B = [
    # exact duplicate of doc 1 arriving in a LATER micro-batch
    {"doc_id": 4, "text": "the quick brown fox jumps over the lazy dog again", "source": "b"},
    {"doc_id": 5, "text": "the cat and the dog of the house is in the garden", "source": "b"},
]


def _write(dirpath, name, rows):
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_ingest_dedups_across_batches(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    _write(src, "a.json", DOCS_A)
    _write(src, "b.json", DOCS_B)

    out = tmp_path / "corpus"
    run_corpus_ingest(
        spark, str(src), str(out), str(tmp_path / "ckpt"), min_quality=0.5
    )
    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}

    # low-quality doc 2 dropped; duplicate content kept exactly once
    assert 2 not in got
    assert len({1, 4} & got) == 1
    assert {3, 5} <= got

    # streamed survivors == batch pipeline survivors (modulo which
    # duplicate representative wins; compare by fingerprint set)
    batch = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in DOCS_A + DOCS_B],
        ["doc_id", "text", "source"],
    )
    batch_fps = {
        r["fp"]
        for r in clean_documents(batch, 0.5).dropDuplicates(["fp"]).collect()
    }
    stream_fps = {r["fp"] for r in spark.read.parquet(str(out)).collect()}
    assert stream_fps == batch_fps


def test_streaming_ingest_with_model_and_decontam_gates(spark, tmp_path):
    """Optional gates: an eval n-gram drops the contaminated doc; the
    all-zero-weight model with negative bias drops everything it sees;
    streamed survivors still match the batch pipeline run with the
    same gates."""
    docs = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog again", "source": "a"},
        # contains the eval 5-gram below -> decontaminated
        {"doc_id": 2, "text": "leaked secret eval answer key is hidden right here today", "source": "a"},
        {"doc_id": 3, "text": "the rain in spain stays mainly on the plain today", "source": "a"},
    ]
    eval_grams = ["secret eval answer key is"]

    src = tmp_path / "landing2"
    src.mkdir()
    _write(src, "a.json", docs)
    out = tmp_path / "corpus2"
    run_corpus_ingest(
        spark, str(src), str(out), str(tmp_path / "ckpt2"),
        min_quality=0.5, eval_ngrams=eval_grams,
    )
    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert got == {1, 3}

    batch = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in docs],
        ["doc_id", "text", "source"],
    )
    batch_ids = {
        r["doc_id"]
        for r in clean_documents(batch, 0.5, eval_ngrams=eval_grams)
        .dropDuplicates(["fp"]).collect()
    }
    assert got == batch_ids

    # negative-bias zero-weight model rejects every doc
    rejected = clean_documents(
        batch, 0.5, model_weights=[0] * 16, model_bias_millionths=-1
    ).collect()
    assert rejected == []


def test_corrupt_lines_quarantined_not_dropped(spark, tmp_path):
    src = tmp_path / "landing3"
    src.mkdir()
    good = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog again", "source": "a"},
        {"doc_id": 2, "text": "the rain in spain stays mainly on the plain today", "source": "a"},
    ]
    with open(src / "a.json", "w") as f:
        f.write(json.dumps(good[0]) + "\n")
        f.write('{"doc_id": broken not json!!\n')
        # VALID json but the required text field is null / missing: the
        # clean leg drops these, so quarantine must capture them too
        f.write('{"doc_id": 7, "text": null, "source": "a"}\n')
        f.write('{"doc_id": 8, "source": "a"}\n')
        f.write(json.dumps(good[1]) + "\n")

    out, quar = tmp_path / "corpus3", tmp_path / "quarantine3"
    run_corpus_ingest(
        spark, str(src), str(out), str(tmp_path / "ckpt3"),
        quarantine_dir=str(quar),
    )
    assert {r["doc_id"] for r in spark.read.parquet(str(out)).collect()} == {1, 2}
    bad = {r["raw_line"] for r in spark.read.parquet(str(quar)).collect()}
    assert len(bad) == 3
    assert any("broken" in b for b in bad)
    assert any('"doc_id": 7' in b for b in bad)
    assert any('"doc_id": 8' in b for b in bad)


def test_streaming_ingest_near_dup_admission(spark, tmp_path):
    """near_dup_store mode: cross-batch NEAR-dups (not just exact) are
    rejected against the persistent band-key store, and each micro-batch
    lands in its own exactly-once output directory."""
    src = tmp_path / "landing4"
    src.mkdir()
    base = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "in spain stays mainly on the plain and the cat sat on the mat"
    )
    other = (
        "completely different content about spark physical plans and "
        "partition pruning with adaptive query execution at scale"
    )
    third = (
        "a third unrelated document mentioning bloom filters z order "
        "clustering and columnar layouts for large analytical scans"
    )
    with open(src / "a.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": base, "source": "s"}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": base + " tail", "source": "s"}) + "\n")
        f.write(json.dumps({"doc_id": 3, "text": other, "source": "s"}) + "\n")
    with open(src / "b.json", "w") as f:
        f.write(json.dumps({"doc_id": 10, "text": base + " extra", "source": "s"}) + "\n")
        f.write(json.dumps({"doc_id": 11, "text": third, "source": "s"}) + "\n")

    out = tmp_path / "corpus4"
    run_corpus_ingest(
        spark, str(src), str(out), str(tmp_path / "ckpt4"),
        min_quality=0.0,  # only the dedup gate under test
        near_dup_store=str(tmp_path / "lsh_store4"),
    )
    got = {
        r["doc_id"]
        for r in spark.read.parquet(str(out / "batch_*")).collect()
    }
    # 2 is a within-batch near-dup of 1; 10 near-dups batch-0 history
    assert got == {1, 3, 11}


def test_ingest_output_compacts_to_target_files(spark, tmp_path):
    """The small-files story end-to-end: per-batch nested output dirs
    from the near-dup ingest compact into the computed file count with
    identical content (recursiveFileLookup picks up batch_* subdirs)."""
    from pathlib import Path

    from nearscan_kafka_streams_spark.sinks.layout import compact_parquet

    out = tmp_path / "out"
    out.mkdir()
    # simulate the foreachBatch sink's layout: nested batch dirs
    for b in range(5):
        spark.createDataFrame(
            [(b * 10 + i, f"text {b} {i}") for i in range(10)],
            "doc_id long, clean_text string",
        ).coalesce(2).write.parquet(str(out / f"batch_{b:010d}"))
    n_small = len(list(Path(out).rglob("*.parquet")))
    assert n_small >= 10

    dst = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, str(out), dst, target_mb=128, recursive=True)
    assert n_out == 1
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(dst).collect()
    )
    assert got == list(range(50))
