"""Write-time data layout: range-clustered parquet for scan pruning.

At 100 TB the fastest query is the one that never reads most files:
parquet stores per-column min/max in file and row-group footers, and
Spark's scan skips units whose range cannot match a pushed filter.
That only works if the writer CLUSTERS values -- data randomly spread
across files has every file's min/max spanning the whole domain and
nothing is ever skipped.

``write_range_clustered`` is the layout step a pipeline runs once per
snapshot on its hottest filter column(s):

1. ``repartitionByRange(n, cols)`` -- one range-shuffle; Spark samples
   the columns to build balanced range boundaries, so each output file
   owns a narrow, non-overlapping slice of the key domain (the
   single-dimension case of Z-ordering).
2. ``sortWithinPartitions(cols)`` -- no extra shuffle; orders rows
   inside each file so row-group min/max (default 128 MB groups) prune
   WITHIN a file too, and runs compress better (RLE/dictionary).

Point/range filters on the cluster column then read ~1/n of the files
instead of all of them -- the test asserts the written files' footer
ranges are pairwise non-overlapping, which is the property pruning
needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``.

    ``num_files`` sizes the range shuffle; pick ~(table size /
    executor-memory-sized files).  For multi-column clustering the
    first column dominates (lexicographic ranges) -- put the most
    selective filter column first.
    """
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_with_bloom_filters(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    expected_ndv: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write parquet with column bloom filters for point-lookup skipping.

    Clustering (range/Z-order) prunes via footer min/max only for the
    clustered columns; a point filter on any OTHER high-cardinality
    column (account id, receipt hash) reads everything.  Parquet bloom
    filters close that gap: a few bits per distinct value per row
    group, checked before the page data is touched -- `id = X` skips
    every row group whose filter rejects X, no layout change needed.

    ``expected_ndv`` sizes the filter per row group (~1.2 bytes/value
    at the default 1% FPP); oversizing wastes footer bytes, undersizing
    raises the false-positive rate toward useless.
    """
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
        )
    w.parquet(path)


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = 8,
    boundaries: dict[str, list[float]] | None = None,
) -> tuple[F.Column, dict[str, list[float]]]:
    """Interleaved-bit Z-value over 2+ numeric columns.

    Lexicographic range clustering prunes only its FIRST column; a
    Z-order curve interleaves the bit patterns of all cluster columns,
    so files own hyper-rectangles of the key space and footer min/max
    prune on EVERY clustered column (Delta/Iceberg OPTIMIZE ZORDER
    semantics, built from public primitives).

    Per column: quantile-bucket the value into 2^bits ranks
    (``approxQuantile`` boundaries -- skew-robust where uniform
    ``width_bucket`` is not; one tiny driver-side list per column),
    then interleave rank bits.  Bucketing per row is an O(2^bits)
    codegen'd aggregate over the boundary array literal -- generated as
    one SQL string, no per-row Python, no shuffle.

    Returns (zvalue column, boundaries used) so incremental writers can
    reuse boundaries across snapshots.
    """
    n_buckets = 1 << bits_per_col
    if boundaries is None:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        boundaries = {
            c: df.approxQuantile(c, qs, 0.001) for c in cols
        }

    def _bucket_sql(c: str) -> str:
        blit = "array(" + ",".join(f"{float(b)!r}D" for b in boundaries[c]) + ")"
        return (
            f"aggregate({blit}, 0,"
            f" (acc, b) -> acc + IF(CAST({c} AS DOUBLE) >= b, 1, 0))"
        )

    terms = []
    for ci, c in enumerate(cols):
        b = _bucket_sql(c)
        for i in range(bits_per_col):
            # bit i of this column's bucket lands at interleaved
            # position i*len(cols)+ci
            terms.append(
                f"shiftleft(CAST(shiftright({b}, {i}) & 1 AS BIGINT),"
                f" {i * len(cols) + ci})"
            )
    return F.expr(" + ".join(terms)), boundaries


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 32,
    bits_per_col: int = 8,
    mode: str = "overwrite",
) -> dict[str, list[float]]:
    """Write parquet Z-order-clustered on ``cluster_cols``.

    One range shuffle on the z-value + in-partition sort, exactly like
    :func:`write_range_clustered` -- but every clustered column's
    footer ranges narrow, not just the first.  Returns the quantile
    boundaries for reuse by incremental writes.
    """
    z, bounds = zorder_value(df, cluster_cols, bits_per_col)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
    return bounds


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
    mode: str = "errorifexists",
    recursive: bool = False,
) -> int:
    """Rewrite a parquet dataset into ~``target_mb`` files: the
    SMALL-FILES maintenance pass every long-running ingest needs.

    Streaming sinks (foreachBatch per-batch dirs, append-mode parquet)
    accumulate one-or-more files per micro-batch; at 100 TB that is
    millions of KB-scale files, and scan planning + footer reads start
    to dominate query time.  Compaction is the fix: re-read, coalesce
    to ceil(total_bytes / target) partitions, rewrite.

    The output file count is computed from the EXACT on-disk byte
    total (filesystem listing -- not a row-size estimate, which
    compression makes unreliable); since input and output are both
    parquet with the same codec, on-disk size is the right predictor
    of output size.  Returns the number of output files requested.

    Uses ``coalesce`` (narrow -- no shuffle: each output file is a
    union of input files) rather than ``repartition``; if the rewrite
    should also re-cluster, use ``write_range_clustered`` instead.

    ``recursive=True`` is for streaming sinks' nested per-batch dirs
    (out_dir/batch_NNN/part-*.parquet), whose names are not key=value
    partitions and are invisible to the default reader.  It DISABLES
    Hive partition-column inference, so leave it False (the default)
    for flat or ``partitionBy``-written datasets -- compacting a
    date=.../-partitioned source with recursive=True would silently
    drop the partition columns.
    """
    import math

    # size via the Hadoop FS API so any scheme the cluster reads
    # (s3a://, hdfs://, file://) is listed correctly -- a driver-local
    # pathlib walk would silently return 0 for remote paths and
    # collapse the rewrite to ONE task
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    if total == 0:
        raise ValueError(
            f"no parquet bytes found under {src_path}; refusing to "
            "compact an empty or unreadable source"
        )
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    reader = spark.read
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    (
        reader.parquet(src_path)
        .coalesce(n_out)
        .write.mode(mode)
        .parquet(dst_path)
    )
    return n_out


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style directory partitioning (``col=value/`` subdirs) for
    COARSE categorical keys -- the other half of the pruning story
    next to range clustering:

    - range/Z-order clustering prunes WITHIN files via footer min/max
      (continuous keys, many distinct values);
    - directory partitioning prunes whole directories at PLANNING time
      (``PartitionFilters`` in the scan -- files under non-matching
      ``col=value/`` dirs are never even listed into the plan).

    Keep partition keys low-cardinality (lang, date, source-bucket):
    at 100 TB, a 10k-value partition column means millions of tiny
    files and a metadata-bound driver; cluster high-cardinality keys
    inside files instead (`write_range_clustered`).  Partition columns
    are removed from the data files (encoded in the path), so they
    cost zero bytes per row."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)
