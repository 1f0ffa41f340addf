"""Manifest-validated exports: data shipping with integrity receipts.

When a 100 TB corpus snapshot leaves the pipeline (to a training run,
a partner, another region), "the files arrived" is not a guarantee --
partial copies, dropped files, and schema drift are all silent.  This
writer emits a `_manifest.json` next to the data recording what was
written (total rows, per-file row counts, schema, a content
fingerprint), and the validator re-derives those facts at the
destination and diffs them.

Design:
- per-file row counts come from ONE pass grouped by
  `input_file_name()` over the just-written files -- metadata-light,
  no second full shuffle;
- the content fingerprint is an ORDER-INDEPENDENT xor/sum over
  per-row xxhash64 of the serialized row, so it is stable across
  partitionings and file layouts (two exports of the same data match
  even if file boundaries differ);
- validation failure names exactly what diverged (missing file, row
  delta, schema change, fingerprint mismatch).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_manifest.json"


def _content_fingerprint(df: DataFrame) -> int:
    """Order- and partitioning-independent corpus fingerprint:
    sum (mod 2^64) of per-row xxhash64 over all columns."""
    h = df.select(
        F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
    )
    row = h.agg(
        F.sum(F.col("h").cast("decimal(38,0)")).alias("s")
    ).first()
    s = int(row["s"] or 0)
    return s % (1 << 64)


def write_with_manifest(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> dict:
    """Write parquet + `_manifest.json`; returns the manifest dict."""
    df.write.mode(mode).parquet(path)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    per_file = {
        os.path.basename(r["f"]): r["n"]
        for r in written.groupBy(
            F.input_file_name().alias("f")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest = {
        "total_rows": int(sum(per_file.values())),
        "n_files": len(per_file),
        "files": per_file,
        "schema": written.schema.jsonValue(),
        "fingerprint": _content_fingerprint(written),
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def validate_manifest(spark: SparkSession, path: str) -> list[str]:
    """Re-derive the manifest facts at the destination; returns the
    list of divergences (empty == intact)."""
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        want = json.load(fh)
    df = spark.read.parquet(path)
    problems: list[str] = []

    per_file = {
        os.path.basename(r["f"]): r["n"]
        for r in df.groupBy(F.input_file_name().alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for fname, n in want["files"].items():
        if fname not in per_file:
            problems.append(f"missing file: {fname}")
        elif per_file[fname] != n:
            problems.append(
                f"row delta in {fname}: {per_file[fname]} != {n}"
            )
    for fname in per_file:
        if fname not in want["files"]:
            problems.append(f"unexpected file: {fname}")

    total = sum(per_file.values())
    if total != want["total_rows"]:
        problems.append(f"total rows {total} != {want['total_rows']}")
    if df.schema.jsonValue() != want["schema"]:
        problems.append("schema differs from manifest")
    if _content_fingerprint(df) != want["fingerprint"]:
        problems.append("content fingerprint mismatch")
    return problems
