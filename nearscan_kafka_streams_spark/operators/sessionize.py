"""Sessionization: gap-based session windows over a keyed event stream.

The reference has no session windows (SURVEY (S)2.5 "Absent"), but a
training-data/event pipeline needs them; this is the canonical custom
stateful operator, implemented twice:

- batch: pure window functions -- lag + gap-flag + running sum
  (the standard SQL sessionization idiom; fully Catalyst-planned,
  SQL-expressible, so the driver's DuckDB oracle can check it);
- streaming: ``applyInPandasWithState`` with per-key timeout state --
  the Structured Streaming pattern for operators Spark lacks built-in
  (state = open session aggregate, closed sessions emitted on gap or
  watermark timeout).

Scale: one shuffle on the session key either way; batch window sort is
per-key (Spark sorts within partitions after hash exchange); streaming
state is one open session per key.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window


def sessionize_batch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same key exceeds ``gap_minutes``.

    Output: one row per session with start/end/n_events.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    # microsecond precision on BOTH engines (oracle: epoch_us) -- a
    # seconds-truncated cast splits sessions differently from the
    # oracle when a true gap lands within 1s of the boundary
    gap = F.lit(gap_minutes * 60 * 1_000_000)
    # unix_micros rejects TIMESTAMP_NTZ (tz-less parquet under
    # inferTimestampNTZ); only gap DIFFERENCES matter here, so a cast
    # through the session zone is offset-invariant
    ts = F.col(ts_col)
    if events.schema[ts_col].dataType.typeName() == "timestamp_ntz":
        ts = ts.cast("timestamp")
    micros = F.unix_micros(ts)
    flagged = events.withColumn(
        "_new_session",
        F.when(
            micros - F.lag(micros).over(w) > gap,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).withColumn(
        "_session_seq",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy(key_col, "_session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            key_col,
            F.col("_session_seq").alias("session_seq"),
            "session_start",
            "session_end",
            "n_events",
        )
    )


_SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState.

    State per user: the open session (start/end/n/total).  A batch's
    events extend or close it; a closed session is emitted when a gap
    appears within a batch or the state times out (event-time timeout
    at watermark + gap).  Late events beyond the watermark are dropped
    by the upstream watermark, mirroring the documented engine-wide
    late-data policy (SURVEY (S)7.4.4).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple[Any, ...],
        pdfs: Any,
        state: GroupState,
    ):
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                s, e, n, total = state.get
                closed.append((user_id, s, e, n, total))
                state.remove()
        elif len(rows):
            rows = rows.sort_values("ts")
            ts_us = (rows["ts"].astype("int64") // 1000).tolist()
            vals = rows["value"].tolist()
            if state.exists:
                s, e, n, total = state.get
            else:
                s, e, n, total = ts_us[0], ts_us[0], 0, 0.0
            for t, v in zip(ts_us, vals):
                if n > 0 and t - e > gap_us:
                    closed.append((user_id, s, e, n, total))
                    s, e, n, total = t, t, 0, 0.0
                e = max(e, t)
                s = min(s, t)
                n += 1
                total += float(v) if v == v else 0.0  # NaN-safe
            state.update((s, e, n, total))
            # close the open session once the watermark passes end + gap
            state.setTimeoutTimestamp((e + gap_us) // 1000)

        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "start_us", "end_us", "n_events", "total_value"],
            )
            out["session_start"] = pd.to_datetime(out.pop("start_us"), unit="us")
            out["session_end"] = pd.to_datetime(out.pop("end_us"), unit="us")
            yield out[
                ["user_id", "session_start", "session_end", "n_events", "total_value"]
            ]

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
