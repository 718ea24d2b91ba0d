"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` payload columns
with typed metadata structs; compute-heavy decode/feature steps run as
Arrow-batched ``mapInPandas`` stages.  The DECODERS THEMSELVES ARE
STUBS -- this container has no image/audio libraries -- but everything
Spark-side is real and tested: schemas, batch iteration, partitioning
behavior, column pruning around the Python stage.

Replace ``_decode_image_stub`` / ``_fingerprint_audio_stub`` with real
PIL/ffmpeg calls to productionize; signatures and batch shapes stay.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
keep payloads out of shuffle keys; repartition by size before the
Python stage so batches are even; project metadata-only downstream so
the binary column is pruned as soon as possible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("byte_checksum", T.LongType(), True),
    ]
)


def media_from_text(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of a text
    column.  Lets every pipeline stage run end-to-end in this
    container with real binary data."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("synthetic").alias("source"),
            F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes | None) -> tuple[int, int, int, int]:
    """STUB decoder: deterministic fake of (n_bytes, width, height,
    checksum).  A real implementation would be::

        from PIL import Image;  im = Image.open(io.BytesIO(payload))
        return len(payload), im.width, im.height, crc

    (PIL is not available here -- NotImplementedError semantics are
    replaced by a deterministic fake so the plumbing stays testable.)
    """
    if payload is None:
        return 0, 0, 0, 0
    n = len(payload)
    checksum = sum(payload[:64]) + n * 131
    return n, (n % 640) + 1, (n % 480) + 1, checksum


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real mapInPandas plumbing: iterator of pandas batches in/out,
    output schema declared, payload column pruned after this stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(_decode_image_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": feats.map(lambda f: f[0]).astype("int64"),
                    "width": feats.map(lambda f: f[1]).astype("int32"),
                    "height": feats.map(lambda f: f[2]).astype("int32"),
                    "byte_checksum": feats.map(lambda f: f[3]).astype("int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("fingerprint", T.ArrayType(T.LongType()), True),
    ]
)


def _fingerprint_audio_stub(payload: bytes | None) -> tuple[int, int, list[int]]:
    """STUB audio fingerprinter: deterministic fake of (n_bytes,
    duration_ms, 4-gram chroma-like fingerprint).  A real one would
    decode via ffmpeg/librosa and emit a chromaprint; neither library
    ships in this container, so the fake derives a stable fingerprint
    from byte chunks -- the plumbing (batch shape, array column out)
    is what's under test.
    """
    if not payload:
        return 0, 0, []
    n = len(payload)
    duration_ms = n * 8  # pretend 1 byte ~ 8ms of audio
    fp = [sum(payload[i : i + 16]) % 997 for i in range(0, min(n, 64), 16)]
    return n, duration_ms, fp


def fingerprint_audio(media: DataFrame) -> DataFrame:
    """Arrow-batched audio fingerprinting over binary payloads
    (mapInPandas, same contract as extract_image_features)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(_fingerprint_audio_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": feats.map(lambda f: f[0]).astype("int64"),
                    "duration_ms": feats.map(lambda f: f[1]).astype("int64"),
                    "fingerprint": feats.map(lambda f: f[2]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """STUB frame sampler: emits (media_id, frame_idx, offset) rows as a
    real ffmpeg-backed sampler would; offsets are deterministic from
    payload length.  Pure built-in expressions (explode over sequence)
    -- the Spark-side shape of frame extraction without the codec."""
    n = F.coalesce(F.octet_length("payload").cast("long"), F.lit(0))
    offsets = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n_bytes))
    ).otherwise(F.array().cast("array<long>"))
    return media.select(
        "media_id", F.posexplode(offsets).alias("frame_idx", "byte_offset")
    )
