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


# node names can be multi-word with trailing spaces ("Scan parquet  (3)")
_TREE_NODE = re.compile(r"([A-Za-z][A-Za-z0-9_]*(?:\s+[A-Za-z][A-Za-z0-9_.]*)*)\s+\((\d+)\)")
_DETAIL_HDR = re.compile(r"^\((\d+)\) ")
# each subquery in the "===== Subqueries =====" section opens with its
# own tree render followed by its own detail blocks
_SUBQ_HDR = re.compile(r"^Subquery:\d+ Hosting")


def strip_cached_lineage(plan: str) -> str:
    """Drop every InMemoryRelation's embedded child plan from a
    ``formatted`` explain string.

    A consumer of a persisted frame does NOT execute the frame's build
    plan -- it reads the in-memory columnar blocks -- yet formatted
    explain renders the build plan twice per cache reference (tree
    subtree under InMemoryRelation + the numbered node details), so a
    regex fingerprint over the raw text double-counts exchanges/scans
    that never run.  Round-7 adjudication (SCALE.md): staged-family
    fingerprints reported ~2x exchange/scan counts while measured
    times FELL.  This walker keeps each tree down to and including each
    ``InMemoryRelation (N)`` line, drops its deeper-indented subtree,
    and then drops the detail sections of node numbers reachable ONLY
    through dropped subtrees (a number also reachable outside stays).

    The formatted string is processed per SECTION: the main plan, then
    each ``Subquery:N Hosting ...`` block inside the
    ``===== Subqueries =====`` area -- each subquery re-renders its own
    tree (which can embed InMemoryRelation build plans) before its own
    detail blocks, so treating everything after the FIRST detail header
    as details let cached build plans inside subqueries leak their
    detail-header nodes into fingerprints (round-8 ADVICE).
    Included/excluded node sets are accumulated globally across
    sections before any detail block is dropped.
    """
    lines = plan.splitlines(keepends=True)
    starts = [0] + [i for i, ln in enumerate(lines) if _SUBQ_HDR.match(ln)]
    starts.append(len(lines))
    section_bounds = list(zip(starts, starts[1:]))
    excluded: set[int] = set()
    included: set[int] = set()
    tree_keep: dict[int, bool] = {}
    first_details: list[int] = []
    for s, e in section_bounds:
        # within a section, the tree runs until the first detail header
        first_detail = next(
            (i for i in range(s, e) if _DETAIL_HDR.match(lines[i])), e
        )
        first_details.append(first_detail)
        imr_indent: int | None = None
        for i in range(s, first_detail):
            m = _TREE_NODE.search(lines[i])
            if not m:
                tree_keep[i] = imr_indent is None
                continue
            indent, num = m.start(1), int(m.group(2))
            if imr_indent is not None and indent <= imr_indent:
                imr_indent = None
            if imr_indent is not None:
                excluded.add(num)
                tree_keep[i] = False
                continue
            included.add(num)
            tree_keep[i] = True
            if m.group(1).split()[0] == "InMemoryRelation":
                imr_indent = indent
    drop = excluded - included
    kept: list[str] = []
    for (s, e), first_detail in zip(section_bounds, first_details):
        for i in range(s, first_detail):
            if tree_keep[i]:
                kept.append(lines[i])
        # detail blocks: drop whole blocks whose header number is dropped
        keep_block = True
        for i in range(first_detail, e):
            ln = lines[i]
            h = _DETAIL_HDR.match(ln)
            if h:
                keep_block = int(h.group(1)) not in drop
            elif ln.startswith("====="):
                keep_block = True  # subqueries separator resets scope
            if keep_block:
                kept.append(ln)
    return "".join(kept)


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

    Cached lineage is excluded (``strip_cached_lineage``): a consumer
    of a persisted frame reads in-memory blocks, so the frame's build
    plan must not inflate the consumer's shuffle/scan counts.  The
    ``in_memory_scans`` counter makes the cache reference itself
    visible in the fingerprint instead.

    Operators are counted as DISTINCT plan nodes (one detail header
    per node id), not string occurrences: the tree section re-renders
    a shared subtree once PER REFERENCE, so raw string counts grow
    with rendering duplication rather than with physical operators --
    chained scan passes (rfm's three NTILEs) fingerprinted as ~1400
    "exchanges" for a plan with a few dozen distinct nodes.
    """
    plan = strip_cached_lineage(formatted_plan(df))

    nodes: dict[tuple[int, str], str] = {}
    for m in re.finditer(r"^\((\d+)\) (.+)$", plan, flags=re.M):
        name = m.group(2).strip()
        # detail headers carry suffixes like "[codegen id : 1]"
        name = re.sub(r"\s*\[codegen id.*$", "", name)
        nodes[(int(m.group(1)), name)] = name

    def n(pred) -> int:
        return sum(1 for v in nodes.values() if pred(v))

    return {
        "broadcast_hash_join": n(lambda v: v == "BroadcastHashJoin"),
        "sort_merge_join": n(lambda v: v == "SortMergeJoin"),
        "shuffled_hash_join": n(lambda v: v == "ShuffledHashJoin"),
        "nested_loop_join": n(
            lambda v: v in ("BroadcastNestedLoopJoin", "CartesianProduct")
        ),
        "exchanges": n(lambda v: v == "Exchange"),
        "scans": n(lambda v: v.startswith("Scan parquet")),
        "in_memory_scans": n(lambda v: v.startswith("InMemoryTableScan")),
        "pushed_filters": len(_parse_pushed(plan)),
        "wholestage_codegen": len(re.findall(r"WholeStageCodegen", plan)),
        "python_eval": n(
            lambda v: v.startswith(
                (
                    "ArrowEvalPython",
                    "BatchEvalPython",
                    "MapInPandas",
                    "FlatMapGroupsInPandas",
                )
            )
        ),
    }
