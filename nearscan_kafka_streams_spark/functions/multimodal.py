"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode libraries (PIL/librosa/av) are NOT in this container, so the
decode kernels are STUBBED behind ``_HAS_*`` import gates with a
deterministic fake; everything Spark-side is real and tested:

- schema: binary payload + metadata struct (modality, mime, width/
  height/duration, sha), the layout a 100 TB multimodal lakehouse uses
  (payload stays opaque to Catalyst; metadata columns prune/push down);
- partition-parallel transforms over ``mapInPandas`` with Arrow
  batches -- the correct shape for CPU-bound media kernels (one Python
  worker per core, batch amortizes serialization);
- deterministic fake "decode"/"feature extraction" so tests pin batch
  shapes, schemas and partitioning without the real codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoders are absent in this container by design
    import PIL.Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_METADATA_TYPE = StructType(
    [
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("sha_hex", StringType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("meta", MEDIA_METADATA_TYPE, True),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Compute the metadata struct JVM-side (no decode needed):
    byte length, sha2 digest; modality/mime passed through if present."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            (F.col("modality") if "modality" in df.columns else F.lit("image")).alias(
                "modality"
            ),
            (F.col("mime") if "mime" in df.columns else F.lit(None).cast("string")).alias(
                "mime"
            ),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
            F.sha2(p, 256).alias("sha_hex"),
        ),
    )


_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("feature", DoubleType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decode: derive a fake
    (width, height, feature) from the payload bytes themselves."""
    if payload is None or len(payload) == 0:
        return (0, 0, 0.0)
    w = 1 + payload[0] % 64
    h = 1 + payload[-1] % 64
    feature = float(sum(payload[:32])) / (32 * 255)
    return (w, h, feature)


def decode_media(df: DataFrame, real: bool = False) -> DataFrame:
    """Partition-parallel media decode via mapInPandas (Arrow batches).

    ``real=True`` requires the actual codec libraries -- unavailable
    here -> NotImplementedError, as documented.  The fake path keeps
    the exact same plan shape (schema, batching, partitioning), so the
    Spark plumbing is fully exercised.
    """
    if real and not _HAS_PIL:
        raise NotImplementedError(
            "real media decode requires PIL/librosa/av; not in this container"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                _fake_decode(p if p is None or isinstance(p, bytes) else bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "feature": [d[2] for d in decoded],
                }
            )

    return df.select("media_id", "payload").mapInPandas(batches, _DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing: explode one row per sampled offset.

    For real video this is per-keyframe; the fake samples byte offsets.
    Shape matters: one input row -> N output rows, JVM-side explode.
    """
    n = F.greatest(
        (F.length(F.col("payload")) / every_n_bytes).cast("int"), F.lit(1)
    )
    return df.withColumn(
        "frame_index", F.explode(F.sequence(F.lit(0), n - 1))
    ).select("media_id", "frame_index")


def make_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped table from a text table: payload =
    utf-8 bytes (deterministic), metadata attached JVM-side.  Lets the
    whole multimodal path run on the driver's documents table."""
    base = df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
    return attach_media_metadata(base)
