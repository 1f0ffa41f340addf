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
    local = ranged.withColumn(
        "_local",
        F.sum("_v").over(Window.partitionBy("_pid").orderBy(order_col)),
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
