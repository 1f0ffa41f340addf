"""Table profiling: per-column statistics in one pass.

The ANALYZE-style profile every large-scale pipeline runs before
planning partitioning, cleaning thresholds, and join strategies:
row count, null count, exact distinct count, min/max per column,
emitted long-form (one row per column) so downstream tooling can
diff profiles across snapshots.

Scale shape: ONE aggregation job over the table -- all columns'
counters compute in the same pass (Spark expands multiple DISTINCT
aggregates internally; each adds a shuffle of (column, value) pairs).
Exact distinct counts are the expensive part at 100 TB: swap
``F.countDistinct`` for ``F.approx_count_distinct`` via
``exact_distinct=False`` when a ±2% estimate is enough -- same plan
minus the expand, sketch-merged map-side.

min/max are aggregated in the column's native type and cast to string
AFTER (casting before would compare "100" < "99" lexicographically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile of ``df``: one output row per column with
    (column_name, n_rows, n_nonnull, n_distinct, min_value, max_value).
    min/max as strings so heterogeneous column types stack into one
    long-form result."""
    from nearscan_kafka_streams_spark.functions.dedup import _spread

    # the multi-DISTINCT aggregate expands the input |cols|-fold and
    # partially aggregates IN THE SCAN'S PARTITIONING; a bench-scale
    # parquet table arrives as ONE split, serializing the expand on a
    # single task (round-12 stage census: 1.6 s of 2.5 s wall on one
    # task for profile_orders).  _spread is a no-op at scale.
    df = _spread(df)
    cols = columns or df.columns
    nd = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nonnull"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    counters: int = 4096,
) -> DataFrame:
    """Exact top-k frequent values with BOUNDED per-task memory: the
    two-pass Misra-Gries heavy-hitters pattern.

    Pass 1 (candidate generation): each task runs a Misra-Gries
    summary with ``counters`` slots over its partition inside
    ``mapInPandas`` (vectorized value_counts per Arrow batch, decrement
    -and-evict when the summary overflows) and emits only its surviving
    candidate values.  By the MG guarantee + pigeonhole, the UNION of
    per-partition candidates contains every value with global count
    > N/counters -- so it contains the true top-k whenever the k-th
    count clears that bar (the operating condition; pick ``counters``
    >= N/count_k).

    Pass 2 (exact recount): the candidate set (<= counters x tasks
    values, tiny) is broadcast; the corpus is re-scanned counting ONLY
    candidates, then the exact ordered top-k is taken.

    Why not ``groupBy(value).count()`` straight off: at 100 TB that
    shuffles EVERY distinct value (the full vocabulary); here the
    shuffle carries only candidate rows, and pass-1 state is a fixed
    ``counters``-entry dict per task regardless of corpus size.
    A plain ``groupBy(value).count().orderBy(...).limit(k)`` over the
    same input is the full-shuffle form; under the operating condition
    this returns the identical ordered top-k with bounded state (the
    degenerate-equality test in tests/test_misc_ops.py).
    """
    vals = df.select(F.col(value_col).alias("v")).where(F.col("v").isNotNull())
    out_type = vals.schema["v"].dataType.simpleString()

    def _mg_partition(batches):
        import heapq

        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for v, c in pdf["v"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > counters:
                # decrement all by the smallest surplus count and evict
                # non-positive entries: the MG step, amortized per batch
                floor = heapq.nsmallest(len(counts) - counters, counts.values())[-1]
                counts = {
                    v: c - floor for v, c in counts.items() if c - floor > 0
                }
        yield pd.DataFrame({"v": list(counts.keys())})

    cand = (
        vals.mapInPandas(_mg_partition, f"v {out_type}")
        .distinct()
    )
    recount = (
        vals.join(F.broadcast(cand), "v", "left_semi")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_ord = [F.col("n").desc(), F.col("v").asc()]
    return (
        recount.orderBy(*w_ord)
        .limit(k)
        .select(F.col("v").alias("value"), "n")
    )
