"""Similarity-search tests: exactness of brute force, recall of LSH."""

from __future__ import annotations

import math
import random

from nearscan_kafka_streams_spark.functions.similarity import (
    brute_force_topk,
    lsh_topk,
)


def _vectors(n=200, dim=16, clusters=5, seed=7):
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(clusters)]
    rows = []
    for i in range(n):
        c = centers[i % clusters]
        rows.append((i, [x + rng.gauss(0, 0.15) for x in c]))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_bruteforce_matches_python_oracle(spark):
    rows = _vectors()
    df = _df(spark, rows)
    queries = df.where("vec_id < 5")
    got = brute_force_topk(df, queries, k=3).collect()

    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine"])
        )
    vecs = dict(rows)
    for qid, neighbors in by_query.items():
        scored = sorted(
            ((_cosine(vecs[qid], v), -i) for i, v in vecs.items() if i != qid),
            reverse=True,
        )
        expect = [(-negid) for _, negid in scored[:3]]
        got_ids = [nid for _, nid, _ in sorted(neighbors)]
        assert got_ids == expect, f"query {qid}"
        assert len(neighbors) == 3


def test_bruteforce_cosine_values(spark):
    rows = _vectors(n=50)
    df = _df(spark, rows)
    got = brute_force_topk(df, df.where("vec_id = 0"), k=1).collect()[0]
    vecs = dict(rows)
    expect = max(
        (_cosine(vecs[0], v), i) for i, v in vecs.items() if i != 0
    )
    assert got["neighbor_id"] == expect[1]
    assert abs(got["cosine"] - expect[0]) < 1e-9


def test_lsh_recall_on_clustered_data(spark):
    """Clustered vectors: same-cluster neighbors are near-identical
    directions, so the bucketed search must recover most of the true
    top-k (recall >= 0.6 with 4 bits on 5 well-separated clusters)."""
    rows = _vectors(n=200, dim=16, clusters=5)
    df = _df(spark, rows)
    queries = df.where("vec_id < 10")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries, k=5, query_id_col="query_id").collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(df, queries, k=5, bits=4, dim=16).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.6, f"recall {recall}"


def test_ivf_recall_beats_or_matches_lsh(spark):
    """IVF cells adapt to the cluster structure; recall on clustered
    data must be high (>= 0.8 with 8 cells / 3 probes on 5 clusters)."""
    from nearscan_kafka_streams_spark.functions.similarity import ivf_topk

    rows = _vectors(n=200, dim=16, clusters=5)
    df = _df(spark, rows)
    queries = df.where("vec_id < 10")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(df, queries, k=5, n_clusters=8, n_probe=3).collect()
    }
    recall = len(truth & ivf) / len(truth)
    assert recall >= 0.8, f"IVF recall {recall}"


def test_ivf_deterministic(spark):
    from nearscan_kafka_streams_spark.functions.similarity import ivf_topk

    rows = _vectors(n=100, dim=16)
    df = _df(spark, rows)
    q = df.where("vec_id < 5")
    a = sorted(map(tuple, ivf_topk(df, q, k=3, n_clusters=8).collect()))
    b = sorted(map(tuple, ivf_topk(df, q, k=3, n_clusters=8).collect()))
    assert a == b


def test_lsh_deterministic(spark):
    rows = _vectors(n=100, dim=16)
    df = _df(spark, rows)
    q = df.where("vec_id < 5")
    a = sorted(map(tuple, lsh_topk(df, q, k=3, bits=4, dim=16).collect()))
    b = sorted(map(tuple, lsh_topk(df, q, k=3, bits=4, dim=16).collect()))
    assert a == b


def test_auto_signature_bits_bounds_bucket_sizes():
    """bits ~ log2(n/256): expected bucket size stays near the target
    at ANY corpus size instead of n/16 (the fixed-4-bit failure mode)."""
    from nearscan_kafka_streams_spark.functions.similarity import (
        auto_signature_bits,
    )

    assert auto_signature_bits(500) == 4  # small corpora keep old output
    assert auto_signature_bits(10_000) == 6
    assert auto_signature_bits(1_000_000) == 12
    assert auto_signature_bits(10_000_000_000) == 16  # capped
    for n in (10_000, 1_000_000, 50_000_000):
        b = auto_signature_bits(n)
        assert b == 16 or n / (1 << b) <= 4 * 256  # expected bucket bound


def test_pq_recall_on_clustered_data(spark):
    """PQ/ADC with 8 subspaces x 16 codes over 16-dim clustered vectors:
    the ADC shortlist must land in the right cluster, and the refine
    stage (exact cosine over a 25-deep shortlist) must recover most of
    the true top-k."""
    from nearscan_kafka_streams_spark.functions.similarity import pq_topk

    rows = _vectors(n=200, dim=16, clusters=5)
    df = _df(spark, rows)
    queries = df.where("vec_id < 10")
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(df, queries, k=5).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(df, queries, k=5, m=8, n_codes=16, dim=16).collect()
    }
    recall = len(truth & pq) / len(truth)
    # ADC alone cannot separate near-tie in-cluster neighbors -- it
    # only needs to land the shortlist in the right region
    assert recall >= 0.15, f"ADC-only recall {recall}"
    refined = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(
            df, queries, k=5, m=8, n_codes=16, dim=16, rerank=25
        ).collect()
    }
    recall_r = len(truth & refined) / len(truth)
    assert recall_r >= 0.8, f"PQ+refine recall {recall_r}"


def test_pq_deterministic_and_score_bounded(spark):
    """Same seed -> identical output; ADC approximates cosine of unit
    vectors, so scores stay within a loose [-1.5, 1.5] envelope."""
    from nearscan_kafka_streams_spark.functions.similarity import pq_topk

    rows = _vectors(n=100, dim=16)
    df = _df(spark, rows)
    q = df.where("vec_id < 5")
    a = sorted(map(tuple, pq_topk(df, q, k=3, m=4, n_codes=8, dim=16).collect()))
    b = sorted(map(tuple, pq_topk(df, q, k=3, m=4, n_codes=8, dim=16).collect()))
    assert a == b
    assert all(-1.5 <= r[2] <= 1.5 for r in a)


def test_persisted_ivf_index_search(spark, tmp_path):
    """build_ivf_index + ivf_search: (a) full probe equals brute force
    exactly; (b) 3-probe search on clustered data keeps high recall;
    (c) the probe scan is partition-pruned -- the vectors scan carries
    a partition filter on _cell (dynamic pruning from the probe join),
    so unprobed cells' files are skipped by the SCAN, not the join."""
    from nearscan_kafka_streams_spark.functions.similarity import (
        build_ivf_index,
        ivf_search,
    )

    rows = _vectors(n=400, clusters=8)
    df = _df(spark, rows)
    path = str(tmp_path / "ivf_index")
    n_cells = build_ivf_index(df, path, n_clusters=8)
    assert n_cells == 8
    queries = df.where("vec_id < 10")

    full = ivf_search(spark, path, queries, k=3, n_probe=n_cells)
    exact = brute_force_topk(df, queries, k=3)
    assert sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in full.collect()
    ) == sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in exact.collect()
    )

    probe3 = ivf_search(spark, path, queries, k=3, n_probe=3)
    got = {
        (r["query_id"], r["neighbor_id"]) for r in probe3.collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    recall = len(got & want) / len(want)
    assert recall >= 0.9, recall

    plan = probe3._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:3000]

    # index reuse: a second search needs no refit (reads the same files)
    again = ivf_search(spark, path, queries, k=3, n_probe=3).collect()
    assert len(again) == len(probe3.collect())


def test_ivf_index_append_fullprobe_exact(spark, tmp_path):
    """ivf_index_append: build on half the corpus, append the rest
    against the frozen centroids; a full-probe search over the appended
    index equals brute force over the WHOLE corpus (scoring in probed
    cells is exact, so stale centroids cannot affect a full probe),
    and the centroid file is untouched by the append."""
    from nearscan_kafka_streams_spark.functions.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_search,
    )

    rows = _vectors(n=400, clusters=8)
    df = _df(spark, rows)
    path = str(tmp_path / "ivf_append")
    n_cells = build_ivf_index(df.where("vec_id % 2 = 0"), path, n_clusters=8)
    before = spark.read.parquet(f"{path}/centroids").collect()
    assert ivf_index_append(df.where("vec_id % 2 = 1"), path) == n_cells
    after = spark.read.parquet(f"{path}/centroids").collect()
    assert sorted(map(str, before)) == sorted(map(str, after))

    queries = df.where("vec_id < 10")
    full = ivf_search(spark, path, queries, k=3, n_probe=n_cells)
    exact = brute_force_topk(df, queries, k=3)
    assert sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in full.collect()
    ) == sorted(
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in exact.collect()
    )


def test_ivf_index_append_new_vectors_searchable(spark, tmp_path):
    """A vector appended after the build is found by a narrow probe:
    append assigns it to the cell of its nearest (frozen) centroid, so
    a query near that vector probes the same cell."""
    from nearscan_kafka_streams_spark.functions.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_search,
    )

    rows = _vectors(n=400, clusters=8)
    df = _df(spark, rows)
    path = str(tmp_path / "ivf_append2")
    build_ivf_index(df.where("vec_id >= 20"), path, n_clusters=8)
    # the held-out 0..19 live in the same clusters as the indexed rest
    ivf_index_append(df.where("vec_id < 20"), path)

    queries = df.where("vec_id < 10")
    got = ivf_search(spark, path, queries, k=3, n_probe=3)
    exact = brute_force_topk(df, queries, k=3)
    want = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    have = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
    assert len(have & want) / len(want) >= 0.9
    # every appended id is physically in the index's cell partitions
    stored = {
        r["neighbor_id"]
        for r in spark.read.parquet(f"{path}/vectors")
        .where("neighbor_id < 20")
        .collect()
    }
    assert stored == set(range(20))
