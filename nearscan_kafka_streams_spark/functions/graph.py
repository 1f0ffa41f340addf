"""Distributed PageRank over an edge DataFrame (exact fixed-point).

Complements the two connected-components implementations in
``functions/dedup.py`` (min-label propagation, large-star/small-star):
PageRank is the weighted-influence sibling -- rank flows along edges
with a damping factor instead of labels flowing undirected.  Used in
curation stacks for source/domain authority weighting (a la Common
Crawl host ranking) feeding the mixture sampler.

Exactness device: ranks live on an integer fixed-point grid
(``UNIT = 10**12`` per whole unit of rank mass).  Every update is
integer ``div``/multiply/sum -- order-independent and engine-exact, so
an unrolled DuckDB CTE reproduces the k-iteration result bit-for-bit.
Dangling nodes (no out-edges) leak their mass each iteration, the
standard simplification; redistributing it is one extra scalar
aggregate if a caller needs the stochastic-matrix variant.

Scale shapes: one iteration = one equi-join of the rank vector to the
edge list on ``src`` plus one partial-aggregated groupBy on ``dst`` --
the textbook bulk-synchronous shape.  The edge list dominates and is
scanned once per iteration; ranks are node-sized.  Both sides hash to
the same key, so AQE reuses the exchange layout; for a fixed big graph,
pre-bucketing the edge table on src (``skew.write_bucketed``) removes
the edge-side shuffle entirely.  No driver collection at any point --
per-iteration lineage is cut with localCheckpoint (same device as the
connected-components rounds) so k iterations never stack k plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 10**12  # fixed-point grid: 1.0 of rank mass


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``n_iter`` damped PageRank iterations over distinct(src, dst)
    edges; returns (node, rank_fp) with rank in UNIT fixed-point.

    ``damping_pct`` is an integer percentage (85 == the canonical
    0.85) so the damping arithmetic stays on the integer grid.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .where(F.col("src") != F.col("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # scalar; drives the integer base rank
    base = UNIT // n
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    ranks = nodes.withColumn("rank_fp", F.lit(base).cast("bigint"))
    for _ in range(n_iter):
        contrib = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"])
            .select(
                F.col("node").alias("u"),
                F.expr("rank_fp div deg").alias("share"),
            )
            .join(e.select(F.col("src").alias("u"), "dst"), "u")
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    # explicit bigint literals: when n makes `base` fit
                    # int32, constant folding would otherwise evaluate
                    # (100-d) * base in 32-bit and overflow under ANSI
                    (
                        F.lit(100 - damping_pct).cast("bigint")
                        * F.lit(base).cast("bigint")
                    )
                    + F.lit(damping_pct).cast("bigint")
                    * F.coalesce(F.col("inflow"), F.lit(0).cast("bigint"))
                )
                .cast("bigint")
                .alias("num"),
            )
            .select("node", F.expr("num div 100").alias("rank_fp"))
            # cut lineage so iteration k doesn't re-execute joins 1..k-1
            .localCheckpoint()
        )
    return ranks
