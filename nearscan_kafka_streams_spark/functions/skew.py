"""Skew-handling utilities: salted joins and co-located (bucketed) joins.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; these are the explicit tools for the cases AQE cannot fix:

- ``salted_join``: a hot key on the LEFT side is spread over
  ``salt_buckets`` partitions by appending a salt to the key; the
  RIGHT side is replicated ``salt_buckets``-fold via explode.  Use
  when one join key holds >~1 partition's worth of rows (classic
  power-law account/url keys at 100 TB).
- ``write_bucketed`` / co-located joins: pre-bucket both fact tables
  on the join key so repeated joins shuffle neither side (the Spark
  answer to the reference's co-partitioned topics requirement,
  SURVEY (S)3.1 "thread/process boundaries").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi-join with left-side salting, right-side replication.

    Semantics identical to ``left.join(right, key, how)`` for inner and
    left joins.  Cost: right side is duplicated ``salt_buckets`` times
    -- use only when right is much smaller than the skewed left.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l = left.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = l.join(r, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) table: subsequent
    equi-joins between tables bucketed on the same key by the same
    count run with NO shuffle exchange on either side."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
