"""Declarative data-quality constraint checking (Deequ-style).

A 100 TB ingest boundary needs machine-checkable contracts BEFORE data
enters the pipeline: completeness, key uniqueness, referential
integrity, value domains, range bounds.  The reference validates
operationally (peek logging + topic inspection, SURVEY (S)5); this module
is the declarative analog for the batch/corpus side, shaped after
Deequ's constraint verification (Schelter et al., VLDB 2018) but
computed as ONE Spark aggregate pass per table + one anti-join per
foreign key.

Output is long-form `(check_name, observed, expected, passed)` with
integer-exact metrics, so the whole report is DuckDB-oracle-checkable.

Scale notes
-----------
- All row-local constraints (nulls, domains, ranges) fold into a single
  partial-aggregated scan: conditional `sum(CASE...)` counters, no
  shuffle beyond the final scalar combine.
- Uniqueness is `count(*) - count(DISTINCT key)`: one hash aggregate on
  the key, skew-safe (partial aggs dedupe map-side).
- Referential integrity is a LEFT ANTI join counted: broadcast when the
  parent's key projection is small, shuffle otherwise -- Catalyst picks;
  a bloom-prune prefilter (see queries.bloom_prune_join_orders) drops in
  when the parent is huge and the violation rate is near zero.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class TableChecks:
    """Constraint set for one table.

    ``complete``    -- columns that must never be null.
    ``unique``      -- column tuples that must be row-unique among rows
                       whose key is fully non-null (null keys are a
                       completeness concern -- declare the column under
                       ``complete`` to flag them).
    ``in_domain``   -- column -> allowed literal values.
    ``satisfies``   -- name -> boolean Column that every row must pass.
    """

    complete: list[str] = field(default_factory=list)
    unique: list[list[str]] = field(default_factory=list)
    in_domain: dict[str, list[str]] = field(default_factory=dict)
    satisfies: dict[str, Column] = field(default_factory=dict)


def _all_not_null(key: list[str]) -> Column:
    cond = F.col(key[0]).isNotNull()
    for k in key[1:]:
        cond = cond & F.col(k).isNotNull()
    return cond


def check_table(df: DataFrame, checks: TableChecks) -> DataFrame:
    """Run all row-local + uniqueness constraints; returns the long-form
    report.  `observed` counts VIOLATIONS, so `expected` is always 0 and
    `passed = observed == 0` -- uniform across check kinds.

    The entire report is ONE aggregate over ONE scan: violation
    counters are conditional sums, uniqueness folds in as
    ``count(*) - count(DISTINCT key)`` (multiple distinct aggregates
    expand map-side, still a single pass over the data), and the
    wide one-row result unpivots to long form with ``stack`` --
    a zero-shuffle reshape of a single row."""
    aggs = []
    names: list[str] = []

    def add(name: str, expr) -> None:
        names.append(name)
        aggs.append(expr.cast("long").alias(name))

    for c in checks.complete:
        add(f"complete:{c}", F.sum(F.col(c).isNull().cast("long")))
    for c, dom in checks.in_domain.items():
        add(
            f"domain:{c}",
            F.sum((~F.col(c).isin(dom) | F.col(c).isNull()).cast("long")),
        )
    for name, cond in checks.satisfies.items():
        # violations = rows where the predicate is not TRUE (null counts)
        add(
            f"satisfies:{name}",
            F.sum((~F.coalesce(cond, F.lit(False))).cast("long")),
        )
    for key in checks.unique:
        # count_distinct drops tuples containing a null, so the delta is
        # taken over fully-non-null-keyed rows only: a null key is a
        # COMPLETENESS concern (declare it under `complete`), not a
        # uniqueness violation -- otherwise checking a nullable column
        # for uniqueness alone would count every null row as a dup.
        non_null = F.count(
            F.when(
                F.lit(True)
                if not key
                else _all_not_null(key),
                F.lit(1),
            )
        )
        add(
            "unique:" + ",".join(key),
            non_null - F.count_distinct(*[F.col(k) for k in key]),
        )
    if not aggs:
        # empty constraint set: df.agg() with zero expressions (and
        # stack(0)) are invalid SQL -- return a valid empty report
        spark = df.sparkSession
        return spark.createDataFrame(
            [],
            "check_name string, observed long, expected long, "
            "passed boolean",
        )
    wide = df.agg(*aggs)
    stack = F.expr(
        "stack({}, {})".format(
            len(names),
            ", ".join(f"'{n}', `{n}`" for n in names),
        )
    ).alias("check_name", "observed")
    return wide.select(stack).select(
        "check_name",
        "observed",
        F.lit(0).cast("long").alias("expected"),
        (F.col("observed") == 0).alias("passed"),
    )


def check_foreign_key(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Referential integrity: count child rows whose non-null key has no
    parent.  LEFT ANTI join -- Catalyst broadcasts the parent key
    projection when small."""
    orphans = (
        child.where(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            on=child_key,
            how="left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    return orphans.select(
        F.lit(f"fk:{child_key}").alias("check_name"),
        "observed",
        F.lit(0).cast("long").alias("expected"),
        (F.col("observed") == 0).alias("passed"),
    )
