"""Manifest-validated exports: integrity receipts for shipped data."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from nearscan_kafka_streams_spark.sinks.manifest import (
    MANIFEST_NAME,
    validate_manifest,
    write_with_manifest,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_intact_export_validates_clean(spark, sf_dir, tmp_path):
    out = str(tmp_path / "export")
    m = write_with_manifest(_docs(spark, sf_dir).repartition(4), out)
    assert m["n_files"] == 4
    assert m["total_rows"] == _docs(spark, sf_dir).count()
    assert validate_manifest(spark, out) == []


def test_fingerprint_is_partitioning_independent(spark, sf_dir, tmp_path):
    """Two exports of the SAME data under different file layouts must
    carry the same content fingerprint."""
    a = write_with_manifest(
        _docs(spark, sf_dir).repartition(2), str(tmp_path / "a")
    )
    b = write_with_manifest(
        _docs(spark, sf_dir).repartition(7, "lang"), str(tmp_path / "b")
    )
    assert a["fingerprint"] == b["fingerprint"]
    assert a["files"] != b["files"]  # layouts genuinely differ


def test_missing_file_detected(spark, sf_dir, tmp_path):
    out = str(tmp_path / "export2")
    write_with_manifest(_docs(spark, sf_dir).repartition(4), out)
    victim = sorted(glob.glob(os.path.join(out, "part-*.parquet")))[0]
    os.remove(victim)
    problems = validate_manifest(spark, out)
    assert any("missing file" in p for p in problems)


def test_corrupted_content_detected(spark, sf_dir, tmp_path):
    """Same row count, different content -> the fingerprint catches
    what counting cannot."""
    out = str(tmp_path / "export3")
    df = _docs(spark, sf_dir).limit(100).repartition(1)
    write_with_manifest(df, out)
    # overwrite the data with equally-sized different rows, keep manifest
    manifest = json.load(open(os.path.join(out, MANIFEST_NAME)))
    tampered = df.withColumn("lang", F.lit("xx")).repartition(1)
    tampered.write.mode("overwrite").parquet(out)
    json.dump(manifest, open(os.path.join(out, MANIFEST_NAME), "w"))
    problems = validate_manifest(spark, out)
    assert any("fingerprint" in p for p in problems)
