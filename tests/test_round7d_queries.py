"""Round-7 staging seam for the co-event graph family: handing the
staged edge frame to the triangle census and clustering coefficient
must be results-identical to their independent 2-arg paths (the same
contract test_round7_queries pins for the Jaccard cluster family)."""

from __future__ import annotations

import pytest

from nearscan_kafka_streams_spark.queries import (
    clustering_coefficient_users,
    co_event_edges_users,
    triangle_count_users,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def staged_co_edges(spark, sf_dir):
    from nearscan_kafka_streams_spark.functions.dedup import release_cached

    edges = co_event_edges_users(spark, sf_dir).persist()
    edges.count()
    yield edges
    edges.unpersist()
    release_cached()


def test_triangle_staged_edges_identical(spark, sf_dir, staged_co_edges):
    assert _rows(triangle_count_users(spark, sf_dir, edges=staged_co_edges)) == _rows(
        triangle_count_users(spark, sf_dir)
    )


def test_clustering_coeff_staged_edges_identical(spark, sf_dir, staged_co_edges):
    assert _rows(
        clustering_coefficient_users(spark, sf_dir, edges=staged_co_edges)
    ) == _rows(clustering_coefficient_users(spark, sf_dir))


def test_edge_list_is_canonical_and_deduped(spark, sf_dir):
    rows = _rows(co_event_edges_users(spark, sf_dir))
    assert rows, "co-event graph empty at test scale"
    assert all(u < v for u, v in rows)
    assert len(rows) == len(set(rows))
