"""Orientation seam of the adjacency-intersection triangle plans
(round-12: the heavy-tail seam documented in round 11 is now
EXECUTED).  The hub stress graph (bench.hub_graph_edges) is the input
id-orientation is super-linear on; these tests pin

  - the generator itself against a pure-Python mirror (the fresh-JVM
    stress-replay contract depends on it being a pure function of the
    row id),
  - triangle counts under BOTH orientations against a fully
    independent all-triples brute force (no shared out-neighbor
    formula -- round-11 ADVICE standard),
  - clustering-coefficient rows under both orientations against a
    per-node brute-force mirror,
  - the "auto" max-degree gate's routing decisions on both graph
    regimes.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from bench import hub_graph_edges
from nearscan_kafka_streams_spark.queries.round5 import (
    _oriented_edges,
    triangle_count_users,
)
from nearscan_kafka_streams_spark.queries.round7 import (
    clustering_coefficient_users,
)

N = 220  # C(220,3) ~ 1.76M triples: exhaustive oracle stays cheap


def _hub_edges_py(n: int) -> set[tuple[int, int]]:
    """Pure-Python mirror of bench.hub_graph_edges (chain + leading
    power-of-two hubs, same exclusions)."""
    edges = {(i, i + 1) for i in range(n - 1)}
    for i in range(2, n):
        h = 1 << (i.bit_length() - 1)
        if h != i and h != i - 1:
            edges.add((h, i))
    return edges


def _brute_triangles(edges: set[tuple[int, int]], n: int) -> list[tuple]:
    """ALL-triples brute force: shares no orientation/out-neighbor
    reasoning with the implementation."""
    return [
        (a, b, c)
        for a, b, c in combinations(range(n), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    ]


@pytest.fixture(scope="module")
def hub_py():
    return _hub_edges_py(N)


def test_hub_generator_matches_python_mirror(spark, hub_py):
    got = {
        (r["u"], r["v"])
        for r in hub_graph_edges(spark, N).collect()
    }
    assert got == hub_py
    # the heavy tail is real at this size: max degree well past the
    # near-regular band
    from collections import Counter

    deg = Counter()
    for u, v in hub_py:
        deg[u] += 1
        deg[v] += 1
    assert max(deg.values()) > 10 * (
        sum(deg.values()) // len(deg)
    ), "hub graph lost its heavy tail"


@pytest.mark.parametrize("orientation", ["id", "degree"])
def test_hub_triangles_both_orientations_match_bruteforce(
    spark, hub_py, orientation
):
    tris = _brute_triangles(hub_py, N)
    row = triangle_count_users(
        spark,
        None,
        edges=hub_graph_edges(spark, N),
        orientation=orientation,
    ).collect()[0]
    nodes = {x for e in hub_py for x in e}
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (
        len(nodes),
        len(hub_py),
        len(tris),
    )
    assert len(tris) > 50, "stress graph must actually close triangles"


@pytest.mark.parametrize("orientation", ["id", "degree"])
def test_hub_cc_both_orientations_match_bruteforce(
    spark, hub_py, orientation
):
    from collections import Counter

    deg = Counter()
    for u, v in hub_py:
        deg[u] += 1
        deg[v] += 1
    tri_n = Counter()
    for a, b, c in _brute_triangles(hub_py, N):
        tri_n[a] += 1
        tri_n[b] += 1
        tri_n[c] += 1
    expect = sorted(
        (
            (
                x,
                deg[x],
                tri_n[x],
                (tri_n[x] * 2_000_000) // (deg[x] * (deg[x] - 1))
                if deg[x] >= 2
                else 0,
            )
            for x in deg
        ),
        key=lambda t: (-t[1], t[0]),
    )[:100]
    got = [
        (r["user_id"], r["degree"], r["n_triangles"], r["cc_ppm"])
        for r in clustering_coefficient_users(
            spark,
            None,
            edges=hub_graph_edges(spark, N),
            orientation=orientation,
        ).collect()
    ]
    assert got == expect


def test_auto_gate_routes_hub_to_degree_and_regular_to_id(spark):
    # hub graph at n=1024: dmax ~ 510 vs sqrt(2m) ~ 64 -- far past the
    # gate on the heavy side
    _, chosen = _oriented_edges(hub_graph_edges(spark, 1024), "auto")
    assert chosen == "degree"
    # the bench near-regular stress graph (d=64) at n=200: dmax = 128
    # vs 4*sqrt(2m) ~ 590 -- well inside the id regime, like the
    # co-event graph (dmax/sqrt(2m) = 0.92 at sf0.1)
    n, d = 200, 64
    regular = (
        spark.range(n * d)
        .select(
            F.expr(f"id div {d}").alias("u"),
            (F.expr(f"id div {d}") + (F.col("id") % d) + 1).alias("v"),
        )
        .where(F.col("v") < n)
    )
    _, chosen = _oriented_edges(regular, "auto")
    assert chosen == "id"


def test_orientation_rejects_unknown_value(spark):
    with pytest.raises(ValueError):
        _oriented_edges(hub_graph_edges(spark, 16), "compact")


def test_auto_on_empty_edges_is_id(spark):
    empty = hub_graph_edges(spark, 16).where(F.lit(False))
    _, chosen = _oriented_edges(empty, "auto")
    assert chosen == "id"
