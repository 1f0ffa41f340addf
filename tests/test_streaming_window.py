"""Streaming tumbling-window aggregation with watermark (the batch
form is the oracle-checked tumbling_window_events query; this pins the
streaming path: window state, late-data drop, append emission)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_streaming_tumbling_window_matches_batch(spark, tmp_path):
    rows = []
    for i in range(40):
        rows.append(
            (i, T0 + dt.timedelta(minutes=3 * i), i % 5, "click", float(i))
        )
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )

    src = tmp_path / "events"
    src.mkdir()
    pdf = df.toPandas()
    pdf.iloc[:20].to_json(src / "a.json", orient="records", lines=True,
                          date_format="iso")
    pdf.iloc[20:].to_json(src / "b.json", orient="records", lines=True,
                          date_format="iso")

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["window_start"]: (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }

    expect = {
        r["window_start"]: (r["n"], r["total"])
        for r in df.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
        .collect()
    }
    # append mode emits only windows finalized by the watermark; the
    # 40th event is at minute 117, watermark 10 min -> the first window
    # (0:00) is final; every emitted window must match batch exactly
    assert got, "no windows emitted"
    for w, (n, total) in got.items():
        assert expect[w] == (n, total)


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: a micro-batch stream enriched against a
    broadcast dimension table -- the standard streaming lookup-join
    (no state, no watermark; the dim is re-broadcast per micro-batch).
    Every streamed row must carry the same enrichment as the batch
    join."""
    rows = [
        (i, T0 + dt.timedelta(minutes=i), i % 4, "click", float(i))
        for i in range(24)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    src = tmp_path / "events"
    src.mkdir()
    pdf = df.toPandas()
    pdf.iloc[:12].to_json(src / "a.json", orient="records", lines=True,
                          date_format="iso")
    pdf.iloc[12:].to_json(src / "b.json", orient="records", lines=True,
                          date_format="iso")

    tiers = spark.createDataFrame(
        [(0, "bronze"), (1, "silver"), (2, "gold"), (3, "none")],
        ["user_id", "tier"],
    )

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    enriched = stream.join(F.broadcast(tiers), "user_id", "left").select(
        "event_id", "user_id", "tier"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["event_id"]: (r["user_id"], r["tier"])
        for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    expect = {
        r["event_id"]: (r["user_id"], r["tier"])
        for r in df.join(tiers, "user_id", "left")
        .select("event_id", "user_id", "tier")
        .collect()
    }
    assert got == expect and len(got) == 24


def test_stream_stream_left_outer_interval_join(spark, tmp_path):
    """Left-outer stream-stream interval join: matched rows carry the
    right side; unmatched left rows emit NULL-padded once the
    watermark passes their join window (the reference topology is
    inner-only -- this pins the engine capability beyond it)."""
    import json

    ldir, rdir = tmp_path / "left", tmp_path / "right"
    ldir.mkdir(), rdir.mkdir()

    def ts(minutes):
        return (T0 + dt.timedelta(minutes=minutes)).isoformat()

    # file 1: l1 (will match), l2 (never matches); r1 matches l1
    (ldir / "a.json").write_text(
        json.dumps({"lid": "l1", "lts": ts(0)}) + "\n"
        + json.dumps({"lid": "l2", "lts": ts(1)}) + "\n"
    )
    (rdir / "a.json").write_text(json.dumps({"rid": "l1", "rts": ts(0)}) + "\n")
    # file 2: watermark pushers far in the future flush l2's window
    (ldir / "b.json").write_text(json.dumps({"lid": "lp", "lts": ts(600)}) + "\n")
    (rdir / "b.json").write_text(json.dumps({"rid": "rp", "rts": ts(600)}) + "\n")

    left = (
        spark.readStream.schema("lid string, lts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(ldir))
        .withWatermark("lts", "10 seconds")
    )
    right = (
        spark.readStream.schema("rid string, rts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(str(rdir))
        .withWatermark("rts", "10 seconds")
    )
    joined = left.join(
        right,
        F.expr(
            "lid = rid AND rts BETWEEN lts - INTERVAL 5 seconds"
            " AND lts + INTERVAL 5 seconds"
        ),
        "leftOuter",
    )
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)

    rows = {
        r["lid"]: r["rid"] for r in spark.read.parquet(out).collect()
    }
    assert rows["l1"] == "l1"  # matched within +/-5s
    assert rows["l2"] is None  # emitted null-padded after watermark


def test_streaming_sliding_window_matches_batch(spark, tmp_path):
    """Sliding (hopping) windows in streaming: 10-min windows every
    5 min under a watermark; every window the stream finalizes must
    equal the batch result bit-for-bit."""
    rows = [
        (i, T0 + dt.timedelta(minutes=3 * i), i % 5, "click", float(i))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    src = tmp_path / "events"
    src.mkdir()
    pdf = df.toPandas()
    pdf.iloc[:20].to_json(src / "a.json", orient="records", lines=True,
                          date_format="iso")
    pdf.iloc[20:].to_json(src / "b.json", orient="records", lines=True,
                          date_format="iso")

    def agg(d):
        return (
            d.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .select(F.col("w.start").alias("window_start"), "n", "total")
        )

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        agg(stream.withWatermark("ts", "10 minutes"))
        .writeStream.format("memory")
        .queryName("slide_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["window_start"]: (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM slide_out").collect()
    }
    expect = {
        r["window_start"]: (r["n"], r["total"]) for r in agg(df).collect()
    }
    assert got, "no windows emitted"
    for w, v in got.items():
        assert expect[w] == v


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """Native session_window aggregation in streaming: the merging
    session state under a watermark.  Two users with gaps straddling
    the 5-min threshold; every finalized session equals batch."""
    rows, eid = [], 0
    for user in (1, 2):
        # two sessions per user: a burst, a >5-min gap, another burst
        for burst_start in (0, 20):
            for j in range(3):
                rows.append(
                    (
                        eid,
                        T0 + dt.timedelta(minutes=burst_start + 2 * j + user),
                        user,
                        "click",
                        1.0,
                    )
                )
                eid += 1
    # a late straggler far ahead so the watermark closes everything
    rows.append((eid, T0 + dt.timedelta(hours=3), 9, "click", 1.0))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    src = tmp_path / "events"
    src.mkdir()
    pdf = df.toPandas()
    pdf.iloc[:7].to_json(src / "a.json", orient="records", lines=True,
                         date_format="iso")
    pdf.iloc[7:].to_json(src / "b.json", orient="records", lines=True,
                         date_format="iso")

    def agg(d):
        return (
            d.groupBy(
                F.session_window("ts", "5 minutes").alias("w"), F.col("user_id")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n",
            )
        )

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        agg(stream.withWatermark("ts", "10 minutes"))
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    expect = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n"])
        for r in agg(df).collect()
    }
    # the four real sessions (2 users x 2 bursts) are all closed by the
    # straggler's watermark; each emitted session must match batch
    emitted_real = {k for k in got if k[0] in (1, 2)}
    assert len(emitted_real) == 4
    for k in got:
        assert expect[k] == got[k]

def test_watermark_late_data_semantics(spark, tmp_path):
    """THE watermark semantic difference vs the reference topology
    (SURVEY.md section 2.8 / section 7): Kafka Streams windowed
    aggregates keep updating on late records until state retention
    expires, while a Spark watermark eventually DROPS late records.
    Spark's guarantee is one-way and two-phased -- pinned here
    empirically (Spark 4.1, RocksDB state store):

    1. a late record whose window state is STILL LIVE (the window has
       not yet been evicted by the watermark) is MERGED -- "delayed
       within the threshold is guaranteed aggregated, delayed beyond
       it may or may not be";
    2. a late record arriving AFTER its window was evicted+emitted is
       DROPPED (numRowsDroppedByWatermark), and the window is never
       re-emitted -- append mode emits each window exactly once.

    A reference user migrating a Kafka Streams topology must know
    both halves; state-store retention there corresponds to phase 2.
    """
    import os

    def ev(eid, **delta):
        return (eid, T0 + dt.timedelta(**delta), eid, "click", 1.0)

    files = [
        # batch 0: two on-time W0=[0:00,1:00) events + a head event
        # pushing the watermark to 2:20, far past W0's end
        [ev(0, minutes=5), ev(1, minutes=10), ev(2, hours=2, minutes=30)],
        # batch 1: late W0 row while W0 state is still live (eviction
        # happens at the END of this batch) -> MERGED, plus a head
        # event advancing the watermark further
        [ev(3, minutes=15), ev(4, hours=3)],
        # batch 2: late W0 row AFTER W0 was evicted+emitted -> DROPPED
        [ev(5, minutes=20), ev(6, hours=5)],
    ]
    df = spark.createDataFrame(
        [r for f in files for r in f],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    src = tmp_path / "events"
    src.mkdir()
    pdf = df.toPandas()
    lo = 0
    for i, f in enumerate(files):
        path = src / f"{chr(ord('a') + i)}.json"
        pdf.iloc[lo : lo + len(f)].to_json(
            path, orient="records", lines=True, date_format="iso"
        )
        # file source orders by modification time: force a < b < c
        os.utime(path, (1_000_000_000 + 100 * i,) * 2)
        lo += len(f)

    q = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .writeStream.format("memory")
        .queryName("late_sem_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM late_sem_out").collect()
    got = {}
    for r in rows:
        got.setdefault(r["window_start"], []).append(r["n"])

    # W0 emitted exactly once: the still-live late row (event 3)
    # merged, the post-eviction late row (event 5) did not
    assert got[T0] == [3], got
    # the drop is observable in the progress metrics of some batch
    dropped = sum(
        (p["stateOperators"][0] or {}).get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1
    # batch form (no watermark) counts every record including both
    # late arrivals -- the gap a migrating reference user must know
    batch = {
        r["window_start"]: r["n"]
        for r in df.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .collect()
    }
    assert batch[T0] == 4
