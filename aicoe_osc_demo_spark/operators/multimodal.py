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
    the bytes are the utf-8 encoding; the pipeline treats them as opaque).

    Rows with NULL content are excluded — there is nothing to decode, and
    the Python decode/hash stages require real bytes (buffer protocol)."""
    df = df.filter(F.col(text_col).isNotNull())
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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_md5", StringType()),
        StructField("n_frame_bytes", IntegerType()),
    ]
)


def stub_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic FAKE resampler — stands in for PIL.Image.resize /
    ffmpeg scale (absent here).  Emits a stable width*height-proportional
    byte string derived from the content so downstream stages see genuinely
    resized payload sizes.  Replace with a real codec in prod."""
    target = max(1, (width * height) // 64)
    reps = (target // max(len(content), 1)) + 1
    return (content * reps)[:target]


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] = stub_resize,
) -> DataFrame:
    """Resize/resample stage: one decoder call per row inside an Arrow
    batch, bytes in → bytes out, executor-side only.  The output schema is
    fixed regardless of decoder; ``resize_fn`` is the single swap point for
    PIL/ffmpeg."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "content": [resize_fn(bytes(c), width, height) for c in pdf["content"]],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 64,
    stride: int = 2,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling stage (video → frames): each input row fans out to up
    to ``max_frames`` frame rows at positions 0, stride, 2*stride, ... —
    the 1:N mapInPandas shape a real ffmpeg keyframe sampler uses, with the
    frame decode stubbed as fixed-size byte windows (deterministic, so the
    fan-out is oracle-checkable).  Bytes never leave the executors; only
    frame fingerprints and sizes come back."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, md5s, sizes = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                data = bytes(content)
                for j in range(max_frames):
                    pos = j * stride
                    if pos * frame_bytes >= len(data):
                        break
                    chunk = data[pos * frame_bytes : (pos + 1) * frame_bytes]
                    ids.append(mid)
                    idxs.append(pos)
                    md5s.append(hashlib.md5(chunk).hexdigest())
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_index": idxs,
                    "frame_md5": md5s,
                    "n_frame_bytes": sizes,
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, schema=FRAME_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-column metadata over the opaque binary (no decode): byte length
    and content hash — JVM-side, no Python."""
    return media.select(
        "media_id",
        "media_type",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def stub_phash(content: bytes) -> int:
    """Deterministic FAKE 60-bit perceptual hash — stands in for aHash /
    pHash over decoded pixels (PIL absent here).  60 bits = 15 md5 hex
    chars, so the value replays in SQL as
    ``CAST('0x' || substr(md5(content), 1, 15) AS BIGINT)`` and stays
    inside a signed 64-bit long.  Replace with a real DCT/average-hash in
    prod — the banding below only assumes "near-duplicate media get
    low-Hamming hashes", which is the pHash contract."""
    return int(hashlib.md5(content).hexdigest()[:15], 16)


def perceptual_hashes(
    media: DataFrame, phash_fn: Callable[[bytes], int] = stub_phash
) -> DataFrame:
    """Per-media perceptual hash as mapInPandas: bytes stay executor-side,
    one decode+hash per row inside an Arrow batch; ``phash_fn`` is the
    single swap point for a real image hash."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [phash_fn(bytes(c)) for c in pdf["content"]],
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, schema=PHASH_SCHEMA)


def phash_near_dup_pairs(
    hashes: DataFrame,
    max_hamming: int = 5,
    bands: int = 6,
    band_bits: int = 10,
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash Hamming distance,
    found via pigeonhole banding (the SimHash trick applied to media):
    split the ``bands * band_bits``-bit hash into ``bands`` keys and
    equi-join on (band, key) — any pair within ``max_hamming <= bands - 1``
    bit flips MUST agree on at least one band, so recall is exact while
    candidate generation stays a hash equi-join (no all-pairs).

    Output: ``(d1, d2, hamming)`` with d1 < d2.

    Scale: candidates per band are bounded by bucket occupancy
    (2^band_bits buckets); the join key is (band int, key int) — media
    bytes never shuffle, only (media_id, phash) longs."""
    mask = (1 << band_bits) - 1
    banded = hashes.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("phash", band_bits * k).bitwiseAND(F.lit(mask))
                    for k in range(bands)
                ]
            )
        ).alias("band", "bkey"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("d1"),
            F.col("b.media_id").alias("d2"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
            .cast("int")
            .alias("hamming"),
        )
        # hamming is row-local, so filter BEFORE the distinct: random band
        # collisions (almost all far above max_hamming) never enter the
        # dedup shuffle
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
