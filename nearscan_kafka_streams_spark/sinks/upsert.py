"""Keyed upsert sink via foreachBatch.

The reference delegates idempotence to a Postgres sink connector with
``insert.mode=UPSERT, pk.fields=account`` (README.md:273-297).  Spark
equivalent: ``foreachBatch`` that merges each micro-batch into a keyed
store.  The default store here is a parquet directory keyed by
``key_col`` (last writer wins per key) -- swap ``merge_fn`` for JDBC
``MERGE`` in a live deployment.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedupe_latest(df: DataFrame, key_col: str, order_cols: list[str]) -> DataFrame:
    """Keep one row per key: the max of order_cols (deterministic)."""
    w = Window.partitionBy(key_col).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def foreach_batch_upsert(
    key_col: str,
    target_path: str,
    order_cols: list[str] | None = None,
    merge_fn: Callable[[DataFrame, int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function performing keyed upserts.

    Update-mode streaming aggregations already emit one latest row per
    changed key per batch; ``order_cols`` guards the general case."""

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        if merge_fn is not None:
            merge_fn(batch_df, batch_id)
            return
        spark = batch_df.sparkSession
        batch = (
            dedupe_latest(batch_df, key_col, order_cols) if order_cols else batch_df
        )
        try:
            current = spark.read.parquet(target_path)
            keys = batch.select(key_col).distinct()
            kept = current.join(keys, key_col, "left_anti")
            merged = kept.unionByName(batch)
        except AnalysisException as e:
            # ONLY the missing-target (first batch) case may fall back to
            # batch-only state; any other failure must surface, not
            # silently truncate the accumulated store
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            merged = batch
        # stage-then-swap: `merged` reads from target_path, so an in-place
        # overwrite could recompute from already-deleted files on executor
        # loss; materialize fully to a staging dir first
        staging = f"{target_path}.staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").parquet(target_path)
        _rmtree_if_local(staging)

    return _upsert


def _rmtree_if_local(path: str) -> None:
    """Best-effort staging cleanup (local filesystems; object stores can
    rely on lifecycle rules or the next batch's overwrite)."""
    import shutil
    from pathlib import Path

    p = Path(path)
    if p.exists():
        shutil.rmtree(p, ignore_errors=True)
