"""Streaming corpus ingest: the training-data cleaning pipeline as a
continuously-running Structured Streaming job.

Batch cleaning (the ``corpus_clean_pipeline`` query) reprocesses the
whole corpus per run; a production ingest instead watches a landing
directory (or Kafka topic) and cleans each arriving batch exactly
once, deduplicating ACROSS batches via streaming state:

  file-stream(json docs) -> scrub -> lang/quality gate
    -> fingerprint -> dropDuplicates(fp) -> append parquet

State: one fingerprint per kept document, the streaming analog of the
batch exact-dedup groupBy.  Unbounded by design for a corpus (identity
set IS the product); for time-bounded retention add an ingest-time
column and ``dropDuplicatesWithinWatermark`` exactly as the event
pipeline does (operators/dedup.py).  At 100 TB the fingerprint state
is 8 bytes + key overhead per doc in the state store (RocksDB-backed),
NOT the documents themselves -- text flows through.

The whole topology is stateless column expressions except the dedup,
so throughput scales with executors; the parquet sink appends
per-micro-batch files (compact with sinks/layout.py off-line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from nearscan_kafka_streams_spark.functions.text import (
    lang_id,
    quality_score,
    scrub_text,
    token_count,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
    ]
)


def clean_documents(
    docs: DataFrame,
    min_quality: float = 0.5,
    model_weights: list[int] | None = None,
    model_bias_millionths: int = 100_000,
    eval_ngrams: list[str] | None = None,
    ngram_n: int = 5,
) -> DataFrame:
    """The cleaning column pipeline, shared verbatim between the batch
    and streaming paths (one definition, two execution modes -- the
    Structured Streaming contract).

    Optional gates, both stateless column work (streaming-safe, no
    extra state or joins):

    * ``model_weights`` -- hashed-feature linear classifier gate
      (functions/quality_model.py): drop docs with negative margin.
    * ``eval_ngrams`` -- inline decontamination: drop docs sharing any
      word n-gram with the (bounded) benchmark gram list, shipped as
      an array literal in the plan.  Real benchmark suites are KBs-MBs
      of grams; for pathological eval sizes run the batch
      ``contamination_report`` anti-join instead.
    """
    t = scrub_text(F.col("text"))
    out = (
        docs.withColumn("clean_text", t)
        .withColumn("lang", lang_id(F.col("clean_text")))
        .withColumn("quality", quality_score(F.col("clean_text")))
        .withColumn("n_tokens", token_count(F.col("clean_text")))
        .where(F.col("quality") >= F.lit(min_quality))
    )
    if model_weights is not None:
        from nearscan_kafka_streams_spark.functions.quality_model import (
            quality_margin_cols,
        )

        kept = quality_margin_cols(
            F.col("clean_text"), model_weights, model_bias_millionths
        )["kept"]
        out = out.where(kept)
    if eval_ngrams is not None:
        from nearscan_kafka_streams_spark.functions.decontam import word_ngrams

        deny = F.array(*[F.lit(g) for g in eval_ngrams])
        out = out.where(
            ~F.arrays_overlap(word_ngrams(F.col("clean_text"), ngram_n), deny)
        )
    return out.withColumn("fp", F.xxhash64(F.col("clean_text"))).select(
        "doc_id", "clean_text", "lang", "quality", "n_tokens", "fp"
    )


def run_corpus_ingest(
    spark,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.5,
    timeout_seconds: float = 600,
    model_weights: list[int] | None = None,
    eval_ngrams: list[str] | None = None,
    quarantine_dir: str | None = None,
    near_dup_store: str | None = None,
) -> None:
    """Drain ``src_dir`` (JSON-lines docs) through the cleaning
    topology into ``out_dir`` parquet, deduplicating by content
    fingerprint across micro-batches; blocks until the available
    input is processed (``availableNow``).  Raises ``TimeoutError``
    (after stopping the query) if the backlog is not drained within
    ``timeout_seconds`` -- returning silently would hand the caller a
    partial corpus with a query still writing behind their back.

    ``quarantine_dir`` captures malformed input lines instead of
    silently nulling them (PERMISSIVE default): a second query writes
    the raw corrupt records there for inspection/replay -- at ingest
    scale, dropped-on-the-floor bad lines are an unmeasurable data
    loss, quarantined ones are a queue.

    ``near_dup_store`` upgrades cross-batch dedup from exact streaming
    state to NEAR-dup admission against a persistent MinHash band-key
    store (functions.dedup.incremental_minhash_dedup): each micro-batch
    writes ``out_dir/batch_<id>`` via foreachBatch.  Exactly-once per
    batch directory: re-delivery of a batch id recomputes the SAME
    survivors (the store ignores a batch's own registrations) and
    overwrites its own directory, so neither the crash-before nor the
    crash-after-registration replay duplicates or loses output."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    quarantine_q = None
    if quarantine_dir is not None:
        # the clean leg drops every line without a usable text field --
        # both unparseable lines (PERMISSIVE -> all-null rows) and valid
        # JSON whose required `text` is null/missing; the quarantine leg
        # re-reads the RAW lines and captures exactly that complement,
        # so 'malformed input is a queue, not a loss' holds for both
        # failure shapes (Spark disallows filtering a json source's
        # corrupt-record column in isolation, so text + from_json is the
        # supported route)
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(src_dir)
        )
        parse_schema = StructType(
            [*DOC_SCHEMA.fields, StructField("_corrupt", StringType())]
        )
        parsed = F.from_json(
            F.col("value"),
            parse_schema,
            {"columnNameOfCorruptRecord": "_corrupt"},
        )
        quarantine_q = (
            raw.where(F.trim("value") != "")
            .where(parsed["_corrupt"].isNotNull() | parsed["text"].isNull())
            .select(F.col("value").alias("raw_line"))
            .writeStream.format("parquet")
            .option("path", quarantine_dir)
            .option("checkpointLocation", f"{checkpoint_dir}_quarantine")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    # unparseable lines surface as all-null rows under PERMISSIVE
    good = stream.where(F.col("text").isNotNull())
    cleaned = clean_documents(
        good,
        min_quality,
        model_weights=model_weights,
        eval_ngrams=eval_ngrams,
    )
    if near_dup_store is None:
        q = (
            cleaned.dropDuplicates(["fp"])
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    else:
        from nearscan_kafka_streams_spark.functions.dedup import (
            gc_staging,
            incremental_minhash_dedup,
            release_cached,
        )

        def _admit(batch_df, batch_id: int) -> None:
            try:
                kept = incremental_minhash_dedup(
                    batch_df,
                    near_dup_store,
                    text_col="clean_text",
                    batch_id=batch_id,
                )
                if kept.limit(1).count() > 0:
                    kept.write.mode("overwrite").parquet(
                        f"{out_dir}/batch_{batch_id:010d}"
                    )
                # the store keeps one _staging survivor snapshot per
                # batch (replay determinism); once this batch's output
                # is durably in out_dir, older snapshots are dead weight
                # -- GC here bounds staging at O(keep_latest x batch)
                # instead of growing with stream lifetime
                gc_staging(near_dup_store)
            finally:
                release_cached()

        q = (
            cleaned.writeStream.foreachBatch(_admit)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    if not q.awaitTermination(timeout_seconds):
        q.stop()
        if quarantine_q is not None:
            quarantine_q.stop()
        raise TimeoutError(
            f"corpus ingest did not drain {src_dir} within "
            f"{timeout_seconds}s; output at {out_dir} is partial"
        )
    if quarantine_q is not None and not quarantine_q.awaitTermination(
        timeout_seconds
    ):
        quarantine_q.stop()
        raise TimeoutError(
            f"quarantine leg did not drain within {timeout_seconds}s; "
            f"{quarantine_dir} is partial"
        )
