"""Mergeable sketches for multi-grain distinct counting.

The reference has no approximate aggregates (SURVEY (S)2.8 lists them
absent); this module is north-star surface: at 100 TB, exact
`count(DISTINCT)` at several grains means several full shuffles of the
fact table, while a Datasketches HLL sketch is built in ONE pass at the
finest grain and every coarser grain is a tiny register-wise merge of
the finished sketches (`hll_union_agg`) -- the classic rollup-by-merge
pattern of mergeable summaries (Agarwal et al., "Mergeable Summaries",
PODS 2012).

HLL registers are a per-bucket MAX over hashed values, so the estimate
is a pure function of the value SET: order-, partition-, and
merge-shape-independent.  `test_sketches.py` pins merge==direct
equality and relative error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One-pass approximate distinct count per group.

    ``lgk=12`` = 4096 registers, ~1.6% standard error, 4 KB per group:
    at 100 TB the whole aggregate state for a million groups is ~4 GB
    spread over executors, vs an unbounded exact-distinct hash set.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
        ).alias("approx_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup_distinct(
    df: DataFrame,
    fine: list[str],
    coarse: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Two-grain rollup from ONE scan: build sketches at the ``fine``
    grain, merge them register-wise up to the ``coarse`` grain.  The
    fact table is read and hashed exactly once; the second aggregation
    runs over |fine groups| 4 KB sketches, not over the data.

    Returns the coarse grain with both the merged estimate and the
    number of fine groups it covers.
    """
    fine_sketches = df.groupBy(*fine).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    )
    return (
        fine_sketches.groupBy(*coarse)
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("sketch"), F.lit(False))
            ).alias("approx_distinct"),
            F.count(F.lit(1)).alias("n_fine_groups"),
        )
        .orderBy(*coarse)
    )
