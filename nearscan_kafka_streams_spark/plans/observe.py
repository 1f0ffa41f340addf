"""P4: diagnostic observation without changing data.

Reference: ``peek`` logging at each topology stage
(TokenBalance.java:123, 271, 332).  Spark equivalent:
``DataFrame.observe`` -- named aggregate metrics collected as a side
effect of the normal execution, reported via QueryExecutionListener /
StreamingQueryListener instead of per-record log lines (per-record
logging is an anti-pattern at 100 TB; observed metrics are free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def observe_counts(df: DataFrame, name: str) -> DataFrame:
    """Attach a row-count observation named ``name`` (P4 peek analog)."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"))
