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
