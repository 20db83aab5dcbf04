"""Multimodal column plumbing (SURVEY X5 / charter "multimodal columns").

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side mechanics — schema, Arrow batch shape,
``mapInPandas`` signatures, partitioning — are real and tested; the
actual media decode is STUBBED (``decode_media`` raises
NotImplementedError: no image/audio libraries in this container) behind a
deterministic fake feature extractor (``extract_features``) so the
pipeline shape is verifiable end-to-end, including by the DuckDB oracle.

Scale notes: binary payloads ride in the same parquet row groups as the
rest of the row; feature extraction is an Arrow-batched ``mapInPandas``
over whatever partitioning the input has (no shuffle). For 100 TB media,
partition by content-defined buckets (e.g. hash(doc_id) % N) so batches
stay near ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, first_byte int, "
    "fake_width int, fake_height int, n_frames int"
)


def attach_binary(docs: DataFrame) -> DataFrame:
    """Model a media table: binary payload + typed metadata columns.

    (Synthesizes the payload from text since the corpus has no real
    media; a production table would read the bytes from parquet/object
    storage directly.)
    """
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.length("text").alias("declared_len"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Real media decode — NOT IMPLEMENTED in this container (no
    PIL/ffmpeg/librosa). The call site and batch shape are what a real
    decoder plugs into; use :func:`extract_features` for the
    deterministic fake."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; wire a decoder into the mapInPandas below"
    )


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real media resize — NOT IMPLEMENTED in this container (no PIL).
    Same mapInPandas wiring as :func:`extract_features`; a real resizer
    yields ``(doc_id, payload)`` batches with transformed bytes."""
    raise NotImplementedError(
        "media resize requires an image library not present in this "
        "environment; wire it into a mapInPandas like extract_features"
    )


FRAME_SCHEMA = "doc_id bigint, frame_id int, frame_bytes bigint"


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: the 1→N ``mapInPandas`` shape (one output
    row per sampled frame). Frame count and per-frame byte length are
    deterministic functions of the payload so the oracle can verify the
    fan-out exactly: ``n_frames = len % 7 + 1``; frame i (stride
    ``every_n``) carries the ``payload[i::n_frames]`` interleave slice.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            doc_ids: list[int] = []
            frame_ids: list[int] = []
            frame_bytes: list[int] = []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                nf = len(b) % 7 + 1
                for i in range(0, nf, every_n):
                    doc_ids.append(did)
                    frame_ids.append(i)
                    frame_bytes.append(len(b[i::nf]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_id": pd.Series(frame_ids, dtype="int32"),
                    "frame_bytes": pd.Series(frame_bytes, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched fake feature extraction over the binary payload.

    Deterministic functions of the bytes (so the oracle can verify the
    plumbing): byte length, first byte, and derived fake dimensions.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf["payload"]
            byte_len = payload.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": byte_len.astype("int64"),
                    "first_byte": payload.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "fake_width": (byte_len % 64 + 1).astype("int32"),
                    "fake_height": (byte_len % 48 + 1).astype("int32"),
                    "n_frames": (byte_len % 7 + 1).astype("int32"),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)
