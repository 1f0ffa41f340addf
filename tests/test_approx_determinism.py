"""Seeded determinism for the declared no-oracle approximate families.

These ten registry entries are the only ones the driver checks
rows-only (MinHash/SimHash banding, LSH/IVF/PQ probe order, GEMM tile
association, sketch merge order are not SQL-expressible exactly); each
is pinned by an exact hash-matched sibling for VALUE correctness.  The
remaining untested axis is REPRODUCIBILITY: every hash/seed in these
paths is a fixed content hash (md5/xxhash/crc32 of the data), never
`rand()`/partition-id/time, so two runs over the same input must be
byte-identical.  This is the property that makes a 100 TB dedup or ANN
index REBUILDABLE: re-running the job after a cluster loss must
reproduce the same candidate set, not a statistically-similar one.
"""

from __future__ import annotations

import pytest

from nearscan_kafka_streams_spark.functions.dedup import release_cached
from nearscan_kafka_streams_spark.queries import QUERIES

APPROX = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_bruteforce_gemm",
    "ann_lsh_cosine",
    "ann_ivf_cosine",
    "ann_pq_cosine",
    "bpe_token_stats",
    "approx_sketches_events",
    "hll_distinct_events",
]


def _canon(df):
    # canonical bytes: sorted column names, rows sorted by repr --
    # order-insensitive (the queries make no row-order promise) but
    # VALUE-exact, floats included (determinism means identical bits,
    # not identical-within-epsilon)
    cols = sorted(df.columns)
    rows = [tuple(repr(row[c]) for c in cols) for row in df.collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", APPROX)
def test_two_runs_byte_identical(spark, sf_dir, name):
    fn = QUERIES[name]
    first = _canon(fn(spark, sf_dir))
    release_cached()
    spark.catalog.clearCache()
    second = _canon(fn(spark, sf_dir))
    release_cached()
    spark.catalog.clearCache()
    assert first == second, f"{name}: two runs diverged"
    assert len(first) > 0, f"{name}: empty result can't pin determinism"
