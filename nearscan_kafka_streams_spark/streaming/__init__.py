from nearscan_kafka_streams_spark.streaming.corpus import (
    clean_documents,
    run_corpus_ingest,
)
from nearscan_kafka_streams_spark.streaming.metrics import ProgressCapture
from nearscan_kafka_streams_spark.streaming.pipeline import (
    build_streaming_transfers,
    run_fixture_pipeline,
)

__all__ = [
    "ProgressCapture",
    "build_streaming_transfers",
    "clean_documents",
    "run_corpus_ingest",
    "run_fixture_pipeline",
]
