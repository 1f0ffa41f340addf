"""Exact-arithmetic K-Means (Lloyd's) over embedding columns.

The training-data curation stack needs clustering twice: SemDeDup-style
semantic dedup prunes within clusters (functions/similarity.py uses a
sampled sklearn-free fit for IVF), and topic/domain balancing buckets
the corpus by centroid.  This module is the *auditable* variant: all
distances and centroid updates run on integer-quantized vectors
(``round(x * scale)`` as BIGINT), so every assignment is bit-exact and
reproducible across engines -- the property the DuckDB oracle gate
checks.  Production at 100 TB keeps the same plan shapes and swaps the
quantized grid for raw doubles.

Scale shapes (the reason this is written the way it is):

- **Assignment is map-only.**  The k centroids are folded into ONE
  literal ``array<struct<cid,cv>>`` column, and the argmin runs inside
  a single projection via ``transform`` + ``aggregate`` +
  ``array_min`` -- no join, no shuffle, no Python.  A 1000-executor
  scan assigns 100 TB without a single exchange.
- **The update is a partial-aggregated posexplode.**  Per-dimension
  sums group on (cid, dim): the explode is a narrow 64x fan-out
  inside codegen, and map-side combine reduces each task's output to
  at most k*dim rows before the exchange, so the shuffle moves
  O(k * dim * partitions) bytes regardless of corpus size.
- **Only centroids ever reach the driver** (k * dim bigints per
  iteration), mirroring the IVF fit-sample contract.

Reference parity: the reference engine has no clustering operator --
this is part of the north-star LLM-pipeline surface (SemDeDup,
arXiv:2303.09540; cluster-balanced sampling) built on the same
aggregate/store machinery its topology uses (TokenBalance.java:279-329
is the keyed-aggregate shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_vec(col: Column, scale: int = 10_000) -> Column:
    """``array<float>`` -> ``array<bigint>`` integer grid
    (``round(x * scale)``), the exactness device shared with the
    revenue-aggregate queries: integer sums are order-independent, so
    no partition-order float drift can flip an argmin."""
    return F.transform(
        col.cast("array<double>"),
        lambda x: F.round(x * scale).cast("bigint"),
    )


def _d2(a: Column, b: Column) -> Column:
    """Exact squared L2 between two ``array<bigint>`` columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _centroid_literal(centroids: dict[int, list[int]]) -> Column:
    """k centroids -> one literal ``array<struct<cid int, cv
    array<bigint>>>`` column (k * dim literals -- tiny; this is the
    'broadcast' that needs no broadcast exchange)."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(
                    *[F.lit(int(v)).cast("bigint") for v in vec]
                ).alias("cv"),
            )
            for cid, vec in sorted(centroids.items())
        ]
    )


def assign_clusters(
    df: DataFrame,
    centroids: dict[int, list[int]],
    vec_col: str = "qv",
) -> DataFrame:
    """Map-only nearest-centroid assignment: adds ``cluster_id`` and
    exact squared distance ``d2``.  Ties break to the lowest cid (the
    struct is ordered (d2, cid) so ``array_min`` is the
    lexicographic argmin)."""
    dists = F.transform(
        _centroid_literal(centroids),
        lambda c: F.struct(
            _d2(F.col(vec_col), c["cv"]).alias("d2"),
            c["cid"].alias("cid"),
        ),
    )
    best = F.array_min(dists)
    return df.withColumn("cluster_id", best["cid"]).withColumn(
        "d2", best["d2"]
    )


def _trunc_div(s: int, n: int) -> int:
    """Truncate-toward-zero integer division: Spark's ``div`` and
    DuckDB's ``//`` both truncate, but Python's ``//`` floors -- this
    keeps the driver-side centroid update on the engines' semantics."""
    q = abs(s) // n
    return -q if s < 0 else q


def update_centroids(
    assigned: DataFrame,
    old: dict[int, list[int]],
    vec_col: str = "qv",
) -> dict[int, list[int]]:
    """One Lloyd's update: per-cluster per-dimension integer mean
    (truncating division).  Empty clusters keep their old centroid.
    Only k * dim aggregated rows are collected."""
    rows = (
        assigned.select("cluster_id", F.posexplode(vec_col).alias("dim", "val"))
        .groupBy("cluster_id", "dim")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    dim = len(next(iter(old.values())))
    acc: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        acc.setdefault(r["cluster_id"], [(0, 0)] * dim)
        acc[r["cluster_id"]][r["dim"]] = (r["s"], r["n"])
    new = {}
    for cid, vec in old.items():
        if cid in acc:
            new[cid] = [_trunc_div(s, n) for s, n in acc[cid]]
        else:
            new[cid] = list(vec)
    return new


def kmeans_fit(
    df: DataFrame,
    init: dict[int, list[int]],
    n_iter: int = 2,
    vec_col: str = "qv",
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Lloyd's K-Means: ``n_iter`` assignment passes with ``n_iter - 1``
    centroid updates between them (n_iter=2 == assign, update,
    assign).  Returns (final assignment DataFrame, final centroids).

    Each iteration is one map-only scan plus one partial-aggregated
    k*dim shuffle; the loop is driver-side but touches only centroid
    bytes.  Deterministic given a deterministic ``init`` (callers use
    lowest-id seeding or a hash-sampled k-means++ spec)."""
    cents = {cid: list(v) for cid, v in init.items()}
    assigned = assign_clusters(df, cents, vec_col)
    for _ in range(n_iter - 1):
        cents = update_centroids(assigned, cents, vec_col)
        assigned = assign_clusters(df, cents, vec_col)
    return assigned, cents
