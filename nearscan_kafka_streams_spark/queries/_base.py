"""Driver-facing query inventory (SURVEY (S)2 + north-star operators).

Each entry is a (spark, sf_dir) -> DataFrame callable paired with an
ANSI-SQL oracle string runnable by DuckDB over the same parquet tables
(pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings).

Conventions for oracle hash-matching:
- every computed column is aliased IDENTICALLY in Spark and SQL;
- double aggregates are rounded to a fixed precision on BOTH sides
  (ulp-level summation-order differences otherwise break the hash);
- deterministic tie-breaks on every top-k / window ordering;
- cross-engine hashes (fingerprints) use md5, which both engines
  implement identically; engine-internal dedup keeps xxhash64.

Queries whose operators are genuinely not SQL-expressible (MinHash-LSH,
SimHash, hyperplane-LSH ANN, mapInPandas decode) have no oracle entry;
the driver records a weaker rows-only check for them (per contract).

Reference parity notes are in each docstring; the NEAR-domain topology
itself (TokenBalance.java) is exercised by tests/ over FIXTURES.md
fixtures since the driver tables are TPC-H-shaped, while its operator
shapes (dedup / interval join / as-of / flat-map explode / sum+max_by
running aggregate) are each expressed below over the events table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nearscan_kafka_streams_spark.functions.dedup import (
    containment_join,
    jaccard_similarity_join,
    minhash_lsh_candidates,
    simhash_pairs,
)
from nearscan_kafka_streams_spark.functions.multimodal import (
    decode_media,
    make_fake_media,
    sample_frames,
)
from nearscan_kafka_streams_spark.functions.similarity import (
    brute_force_topk,
    lsh_topk,
    pq_topk,
)
from nearscan_kafka_streams_spark.functions.text import (
    LANG_STOPWORDS,
    quality_score,
    token_count,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS): read as long ns (session sets
    # spark.sql.legacy.parquet.nanosAsLong) and truncate to us -- exactly
    # what DuckDB does when it casts its TIMESTAMP_NS to TIMESTAMP
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division (div), not /: double division loses ns precision
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


