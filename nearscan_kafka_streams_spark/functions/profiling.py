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
