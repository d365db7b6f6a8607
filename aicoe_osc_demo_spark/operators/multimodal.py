"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, decode / feature-extract as Arrow-batched mapInPandas.

The reference's closest analogue is the PDF byte stream fed to pdfminer /
pdf2image (S1/S3: /root/reference/src/components/preprocessing/
pdf_text_extractor.py:54-117, pdf_table_extractor.py:149-213).  At 100 TB the
invariants are: bytes never leave the executors, decode is batched per Arrow
chunk, and the output schema is fixed regardless of decoder availability.

The actual codecs (PIL/ffmpeg/torchvision) are NOT in this container, so
``decode_fn`` defaults to a clearly-marked deterministic fake that derives
pseudo-metadata from the bytes; the Spark-side plumbing — schema, batching,
partitioning, UDF signature — is real and tested.  Swapping in a real decoder
is passing ``decode_fn=``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def stub_decode(content: bytes) -> dict:
    """Deterministic FAKE decoder — stands in for PIL/ffmpeg (absent here).
    Derives stable pseudo-dimensions/intensity from the byte content so the
    pipeline is testable end-to-end.  Replace with a real codec in prod."""
    digest = hashlib.md5(content).digest()
    return {
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "mean_intensity": digest[2] / 255.0,
    }


def media_from_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build an opaque-binary media table from a text column (test harness:
    the bytes are the utf-8 encoding; the pipeline treats them as opaque)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("content"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
    )


def extract_features(
    media: DataFrame, decode_fn: Callable[[bytes], dict] = stub_decode
) -> DataFrame:
    """Decode + feature-extract as mapInPandas: bytes stay executor-side,
    one decoder call per row inside an Arrow batch, fixed output schema."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_fn(c) for c in pdf["content"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "content_md5": [hashlib.md5(c).hexdigest() for c in pdf["content"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_intensity": [f["mean_intensity"] for f in feats],
                }
            )
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-column metadata over the opaque binary (no decode): byte length
    and content hash — JVM-side, no Python."""
    return media.select(
        "media_id",
        "media_type",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )
