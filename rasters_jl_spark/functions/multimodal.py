"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no decode libraries, so the decode kernels are STUBBED —
clearly marked — while the Spark-side plumbing (schema, batch iteration via
``mapInPandas``, partition sizing) is real and tested. At production scale
each decode batch is one Arrow record batch; partition by media type so
executors with the right codecs handle the right rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media rows from documents (html bytes as payload)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.col("doc_id") % 10000).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB: real implementation would use PIL/libjpeg — not in container."""
    raise NotImplementedError("image decode requires PIL/libjpeg (not in this container)")


def extract_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The *feature kernel* is a deterministic fake (byte-histogram moments) —
    the real decode hook is :func:`decode_image` (stubbed). The Spark
    plumbing (Arrow batching, schema, per-batch vectorisation) is the part
    that matters at scale and is fully real.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if len(arr) == 0:
                    arr = np.zeros(1, dtype=np.uint8)
                chunks = np.array_split(arr.astype(np.float64), feat_dim)
                feats.append([float(np.round(c.mean() if len(c) else 0.0, 4)) for c in chunks])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(bytes(b))),
                    "feature": feats,
                }
            )

    return media.mapInPandas(_batches, FEATURE_SCHEMA)
