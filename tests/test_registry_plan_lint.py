"""Registry-wide physical-plan lint: every `queries()` entry is planned
(never executed) at sf0.001 and screened for the two anti-patterns that
are invisible at test scale and fatal at 100 TB:

- ``CartesianProduct``: an unconditioned join of two DISTRIBUTED sides.
  (Singleton-aggregate cross joins compile to BroadcastNestedLoopJoin
  and are fine -- a broadcast of one row is not a scale risk.)
- ``BatchEvalPython``: a row-at-a-time Python UDF in the data path;
  Python is allowed only through Arrow (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas``...).

The per-query plan tests in test_plans.py pin the plans we WANT for
flagship queries; this lint is the floor under all of them -- a new
registry entry cannot silently ship either anti-pattern.
"""

from __future__ import annotations

import pytest

from nearscan_kafka_streams_spark import queries as Q

# Queries whose plan legitimately contains a flagged node, with the
# reason on record.  Keep this list EMPTY unless a finding is
# adjudicated -- an entry here is a documented exception, not a mute.
CARTESIAN_ALLOWED: dict[str, str] = {}
BATCH_PYTHON_ALLOWED: dict[str, str] = {}


def _registry():
    return list(Q.QUERIES.items())


@pytest.mark.parametrize(
    "name", [n for n, _ in _registry()], ids=[n for n, _ in _registry()]
)
def test_registry_plan_has_no_scale_antipatterns(spark, sf_dir, name):
    fn = Q.QUERIES[name]
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in CARTESIAN_ALLOWED:
        assert "CartesianProduct" not in plan, (
            f"{name}: CartesianProduct in physical plan -- an "
            "unconditioned distributed-x-distributed join"
        )
    if name not in BATCH_PYTHON_ALLOWED:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF (BatchEvalPython) in "
            "the data path -- use Arrow (pandas_udf / mapInPandas)"
        )
