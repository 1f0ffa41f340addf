"""Distributed prefix scan: global running aggregates WITHOUT the
single-task window.

``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY collapses Spark to
ONE task holding the whole table -- the classic accidental serializer
in window-function code, invisible at test scale and fatal at 100 TB.
The distributed form is the textbook two-pass parallel scan:

  1. range-partition by the order key; local cumulative sum per
     partition (parallel, each task sorts only its slice),
  2. per-partition totals (one tiny row per partition) -> exclusive
     prefix offsets via a window over the partition ids -- hundreds of
     rows, trivially single-task,
  3. broadcast-join offsets back; running = local + offset.

Same result as the global window for a UNIQUE order key, but the big
table is touched by exactly one range shuffle and never leaves
parallel execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _persist_ranked(df: DataFrame) -> DataFrame:
    """Persist the range-partitioned+locally-ranked frame so the
    offsets branch and the output branch read ONE materialization.

    Both scans reference this frame twice (per-partition totals/counts
    AND the broadcast-join back), and ``repartitionByRange`` derives
    its bounds from a SAMPLE taken when each exchange materializes:
    if Catalyst evaluates the two references as separate exchanges
    (observed under AQE in a multi-leg union -- ReuseExchange is not
    guaranteed), the branches can see DIFFERENT partition boundaries,
    making offsets disagree with local ranks -- measured as 65
    "64-bucket" groups and rank values past n_total in
    scan_pruning_audit_lineitem.  One persisted materialization pins
    the boundaries for every consumer.  Cost at scale: one
    MEMORY_AND_DISK materialization of the input, the same cost class
    as the shuffle spill the range exchange already wrote; released
    via functions.dedup.release_cached like every staged frame.
    """
    from nearscan_kafka_streams_spark.functions.dedup import (
        _persist_tracked,
    )

    return _persist_tracked(df)


def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = cumulative sum of ``value_col`` in ``order_col``
    order (inclusive).  ``order_col`` must be unique -- ties spanning a
    range boundary would make the result boundary-dependent."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.withColumn("_v", value)
        .repartitionByRange(n, F.col(order_col))
        # range partition ids increase with the key range, so _pid is
        # a valid (coarse) order for the offset pass
        .withColumn("_pid", F.spark_partition_id())
    )
    local = _persist_ranked(
        ranged.withColumn(
            "_local",
            F.sum("_v").over(Window.partitionBy("_pid").orderBy(order_col)),
        )
    )

    totals = local.groupBy("_pid").agg(F.sum("_v").alias("_tot"))
    offsets = totals.select(
        "_pid",
        F.coalesce(
            F.sum("_tot").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0).cast("long"),
        ).alias("_off"),
    )

    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off", "_v")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str = "rn",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = 1-based global row number in ``order_cols``
    order, computed with the same two-pass distributed scan as
    :func:`global_running_sum` -- the big frame takes one range
    shuffle and every sort stays partition-local, vs. the
    single-task ``ROW_NUMBER() OVER (ORDER BY ...)`` collapse.

    The composite ``order_cols`` must be a total order (end with a
    unique key): a tie spanning a range boundary would make the
    numbering boundary-dependent.

    ``total_col``: when set, additionally attach the GLOBAL row count
    as a column of that name.  The count is the sum of the
    per-partition counts the offset pass aggregates anyway, riding the
    same tiny broadcast frame -- so a caller that needs ``n_total``
    (trimmed means, percentile targets, NTILE) gets it for free
    instead of paying a second full pass over the input (one extra
    scan of the base table, or of the persisted ranked frame, per
    query -- measured as a full parquet re-read in
    ``trimmed_mean_lineitem``)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = _persist_ranked(
        ranged.withColumn(
            "_local",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)),
        )
    )
    counts = local.groupBy("_pid").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt")
    )
    extra = (
        [
            F.sum("_cnt")
            .over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("long")
            .alias(total_col)
        ]
        if total_col
        else []
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0).cast("long"),
        ).alias("_off"),
        *extra,
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_pid", "_local", "_off")
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    k: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = exact ``NTILE(k) OVER (ORDER BY order_cols)``
    without the single-task global window.

    NTILE is a pure function of (row_number, total_count): with
    ``n`` rows, the first ``n mod k`` buckets get ``n div k + 1``
    rows and the rest ``n div k`` -- so the distributed
    :func:`global_row_number` plus one broadcast scalar reproduces
    the standard SQL semantics bit-for-bit (Spark and DuckDB agree
    on this fill rule).

    The total count rides :func:`global_row_number`'s offset
    broadcast (``total_col``) -- the bucket arithmetic costs no
    second pass over the frame and no extra join (previously: one
    full count aggregate over the persisted ranked frame plus a
    broadcast nested-loop join, per call -- 3 extra passes in
    ``rfm_segments_customers`` alone)."""
    numbered = global_row_number(
        df,
        order_cols,
        out_col="_rn",
        num_partitions=num_partitions,
        total_col="_n",
    )
    big = F.col("_n") % F.lit(k)  # buckets with floor(n/k)+1 rows
    base = F.expr(f"_n div {k}")
    cut = big * (base + F.lit(1))  # rows covered by the big buckets
    # when n < k, base == 0 and every row lands in the first branch;
    # greatest(base, 1) keeps the (unreachable) second branch from
    # dividing by zero under ANSI evaluation
    bucket = F.when(
        F.col("_rn") <= cut,
        F.ceil(F.col("_rn") / (base + F.lit(1))),
    ).otherwise(
        big + F.ceil((F.col("_rn") - cut) / F.greatest(base, F.lit(1)))
    )
    return (
        numbered.withColumn(out_col, bucket.cast("int")).drop("_rn", "_n")
    )
