"""Property-based invariants for PageRank and K-Means (hypothesis):
randomized graphs / point sets checked against pure-Python models with
the engines' exact semantics (integer fixed-point, truncating
division, lowest-id tie-breaks).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from nearscan_kafka_streams_spark.functions.clustering import (
    _trunc_div,
    kmeans_fit,
)
from nearscan_kafka_streams_spark.functions.graph import UNIT, pagerank

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


def _py_pagerank(edges, n_iter, damping_pct=85):
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    base = UNIT // len(nodes)
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    ranks = {v: base for v in nodes}
    for _ in range(n_iter):
        inflow = {v: 0 for v in nodes}
        for s, d in e:
            inflow[d] += ranks[s] // outdeg[s]
        ranks = {
            v: ((100 - damping_pct) * base + damping_pct * inflow[v]) // 100
            for v in nodes
        }
    return ranks


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=2,
        max_size=30,
    ).filter(lambda es: any(s != d for s, d in es)),
    n_iter=st.integers(1, 3),
)
@settings(**SETTINGS)
def test_pagerank_random_graphs_match_model(spark, edges, n_iter):
    df = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    got = {
        r["node"]: r["rank_fp"] for r in pagerank(df, n_iter=n_iter).collect()
    }
    assert got == _py_pagerank(edges, n_iter)


def _py_kmeans(vecs, init, n_iter):
    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cents = {c: list(v) for c, v in init.items()}

    def assign():
        return {
            vid: min((d2(v, cv), cid) for cid, cv in cents.items())
            for vid, v in vecs.items()
        }

    asg = assign()
    for _ in range(n_iter - 1):
        groups = {}
        for vid, (_, cid) in asg.items():
            groups.setdefault(cid, []).append(vecs[vid])
        for cid in cents:
            if cid in groups:
                g = groups[cid]
                cents[cid] = [
                    _trunc_div(sum(v[d] for v in g), len(g))
                    for d in range(len(g[0]))
                ]
        asg = assign()
    return {vid: (cid, d) for vid, (d, cid) in asg.items()}


@given(
    vals=st.lists(
        st.tuples(
            st.integers(-50, 50), st.integers(-50, 50), st.integers(-50, 50)
        ),
        min_size=4,
        max_size=25,
        unique=True,
    ),
    k=st.integers(1, 3),
    n_iter=st.integers(1, 3),
)
@settings(**SETTINGS)
def test_kmeans_random_points_match_model(spark, vals, k, n_iter):
    k = min(k, len(vals))
    vecs = {i: list(v) for i, v in enumerate(vals)}
    init = {i: vecs[i] for i in range(k)}
    df = spark.createDataFrame([Row(vec_id=i, qv=v) for i, v in vecs.items()])
    got, _ = kmeans_fit(df, init, n_iter=n_iter)
    rows = {r["vec_id"]: (r["cluster_id"], r["d2"]) for r in got.collect()}
    assert rows == _py_kmeans(vecs, init, n_iter)
