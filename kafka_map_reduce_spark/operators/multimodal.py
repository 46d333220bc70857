"""Multimodal column plumbing (Tier C): opaque binary payloads + typed
metadata, decode/feature-extract as Arrow-batched mapInPandas.

Mirrors the reference's data model, where payloads are opaque bytes until
a user stage parses them (/root/reference/src/main.rs:23,
lib.rs:1266) — here the payload is an image/audio/video blob instead of a
JSON string.

The actual codec step is STUBBED: image/audio libraries are not available
in this container, so ``decode_features`` uses a clearly-marked
deterministic fake unless a real decoder import succeeds. The Spark-side
plumbing — binary schema, metadata struct, Arrow batch shape,
partition-parallel mapInPandas — is real and tested; swapping the fake
for PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 4

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary column + typed metadata from documents
    (deterministic: the media payload is the UTF-8 text bytes; width and
    height derive from doc_id)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 24).cast("int").alias("height"),
    )


def _decode_real(blob: bytes) -> list[float]:  # pragma: no cover - env-gated
    """Real decoder path; requires an image library."""
    from PIL import Image  # noqa: F401  (not installed in this container)

    raise NotImplementedError("real image decode wired but library unavailable")


def _decode_fake(blob: bytes) -> list[float]:
    """Deterministic fake feature extractor: mean/min/max/len over bytes."""
    if not blob:
        return [0.0] * FEATURE_DIM
    n = len(blob)
    return [
        float(sum(blob)) / n / 255.0,
        float(min(blob)) / 255.0,
        float(max(blob)) / 255.0,
        float(n % 997),
    ]


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches in, fixed-dim features out.

    Runs partition-parallel with no shuffle; at 100 TB the binary column
    never leaves the executor that read it.
    """
    try:
        import PIL  # noqa: F401

        decode = _decode_real
    except ImportError:
        decode = _decode_fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["media"].map(len).astype("int64"),
                    "features": pdf["media"].map(decode),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_len", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_size: int = 256, every_n: int = 2
) -> DataFrame:
    """Frame sampling plumbing: treat the binary payload as fixed-size
    frames and emit every ``every_n``-th (1 -> N row expansion inside
    mapInPandas — the video-frame-sample shape). The chunking is a
    deterministic stand-in for a real container demuxer (not in this
    container); the Arrow batch shape, binary slicing, and fan-out are the
    real 100 TB plumbing: frames are produced on the executor that holds
    the blob, no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, lens = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob)
                n_frames = -(-len(blob) // frame_size)  # ceil; 0 frames if empty
                for i in range(0, n_frames, every_n):
                    chunk = blob[i * frame_size : (i + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(chunk)
                    lens.append(len(chunk))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames, "frame_len": lens}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("byte_len", T.LongType()),
    ]
)


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: deterministic fake scaler (payload truncated
    proportionally to the target/source pixel-area ratio, min 1 byte) with
    the metadata updated — swapping in a real PIL/ffmpeg resample is a
    one-function change, the schema and Arrow shape stay identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_media, out_len = [], []
            for blob, w, h in zip(pdf["media"], pdf["width"], pdf["height"]):
                blob = bytes(blob)
                ratio = (target_w * target_h) / float(int(w) * int(h))
                new_len = max(1, int(len(blob) * ratio))
                # downscale truncates, upscale tiles — deterministic in
                # both directions so byte counts follow the area ratio
                if blob:
                    resized = (blob * (new_len // len(blob) + 1))[:new_len]
                else:
                    resized = b"\x00" * new_len
                out_media.append(resized)
                out_len.append(len(resized))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out_media,
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                    "byte_len": out_len,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)
