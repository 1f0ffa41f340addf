"""Catalog statistics for cost-based planning (ANALYZE TABLE).

Everything else in this engine plans from file sizes (`sizeInBytes`
from the parquet footers) plus AQE's runtime statistics.  That covers
the first join in a query, but COST-BASED decisions -- join reordering
across 3+ tables, broadcast choice for a *derived* small side before
any stage has run -- need catalog row counts and column NDVs, which
only `ANALYZE TABLE` provides.

At 100 TB this is how a nightly pipeline keeps planning sharp: analyze
once after each ingest (a metadata-cheap count + NDV sketch pass),
and every subsequent query plans against the numbers instead of
assuming defaults.  Spark's CBO flags
(`spark.sql.cbo.enabled`, `spark.sql.cbo.joinReorder.enabled`) consume
exactly these stats.

`register_and_analyze` is the one-call helper: register a parquet
directory as an external table and collect table + column statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_and_analyze(
    spark: SparkSession,
    name: str,
    path: str,
    columns: list[str] | None = None,
) -> None:
    """Register ``path`` as external table ``name`` and collect stats.

    Column-level stats (NDV/min/max/null counts) are gathered for
    ``columns`` (default: all).  The scan is one aggregate job over
    the table -- schedule it with ingest, not per query.
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.catalog.createTable(name, path=path, source="parquet")
    if columns is None:
        columns = spark.table(name).columns
    cols = ", ".join(f"`{c}`" for c in columns)
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")


def table_stats(spark: SparkSession, name: str) -> dict[str, str]:
    """The collected table-level statistics (rows / bytes) as a dict."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    out: dict[str, str] = {}
    for r in rows:
        if r["col_name"] == "Statistics":
            out["statistics"] = r["data_type"]
    return out


def column_stats(spark: SparkSession, name: str, column: str) -> dict[str, str]:
    """Column-level statistics (distinct_count, nulls, min, max...)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name} {column}").collect()
    return {r["info_name"]: r["info_value"] for r in rows}


def plan_sizes(df: DataFrame) -> str:
    """The optimized logical plan WITH cost annotations (sizeInBytes /
    rowCount as the optimizer sees them) -- the thing to read when a
    join strategy surprises you."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "cost"
    )
