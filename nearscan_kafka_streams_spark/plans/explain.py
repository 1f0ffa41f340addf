"""Physical-plan introspection helpers.

The build contract (SURVEY (S)4) requires every operator's plan to be
inspected, not assumed: filters pushed into the parquet scan, columns
pruned to the projection, small dimensions broadcast.  These helpers
extract the facts from ``explain("formatted")`` so tests can assert
them and regressions surface as test failures rather than slow runs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _parse_pushed(plan: str) -> list[str]:
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    return _parse_pushed(formatted_plan(df))


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (column-pruning check)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def plan_summary(df: DataFrame) -> dict:
    """Compact physical-plan fingerprint for round-over-round diffing
    (bench.py embeds one per headline query in BENCH_r{N}.json).

    Counts what matters at scale: join strategies, exchanges (each is a
    shuffle), pushed filters, codegen coverage, Python-eval nodes.

    NB: under AQE the pre-execution formatted plan reports
    ``AdaptiveSparkPlan isFinalPlan=false`` -- codegen spans only
    appear in the post-execution final plan, so ``wholestage_codegen``
    is 0 for adaptive plans here; it is kept because it is stable
    round-over-round (the diff signal), not an absolute coverage
    metric.  ``python_eval`` and join/exchange/scan counts ARE visible
    pre-execution.
    """
    plan = formatted_plan(df)

    def n(pat: str) -> int:
        return len(re.findall(pat, plan))

    return {
        "broadcast_hash_join": n(r"BroadcastHashJoin"),
        "sort_merge_join": n(r"SortMergeJoin"),
        "shuffled_hash_join": n(r"ShuffledHashJoin"),
        "nested_loop_join": n(r"BroadcastNestedLoopJoin|CartesianProduct"),
        "exchanges": n(r"\bExchange\b"),
        "scans": n(r"Scan parquet"),
        "pushed_filters": len(_parse_pushed(plan)),
        "wholestage_codegen": n(r"WholeStageCodegen"),
        "python_eval": n(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas"),
    }
