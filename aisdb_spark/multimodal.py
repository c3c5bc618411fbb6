"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* kernels are
deliberately stubbed (``decode_image`` raises ``NotImplementedError``;
``fake_features`` is a deterministic stand-in) — but everything Spark-side
is real and tested: schema (binary + struct metadata), batching, UDF
signatures, partition behavior. Swapping in Pillow/ffmpeg later changes one
inner function, not the plan.

Pattern precedent: the reference treats rasters/weather as opaque
environmental blobs resolved by lookup kernels (``aisdb/webdata/
load_raster.py``, ``aisdb/weather/data_store.py``); here the blob is the
row payload itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int"
)


def with_media(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload + metadata to each document —
    deterministic (payload = utf-8 text bytes; dims derived from doc_id)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode — requires a codec library not present here."""
    raise NotImplementedError(
        "image decode requires Pillow/opencv; wire it into extract_features"
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Per-payload feature extraction via mapInPandas (deterministic fake
    kernel: byte-level stats standing in for a real embedding)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["media"]
            n = blobs.str.len().fillna(0).astype("int64")
            mean_byte = blobs.map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if b else 0.0
            )
            checksum = blobs.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).astype(np.uint64).sum())
                if b
                else 0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "mean_byte": mean_byte.round(6),
                    "checksum": checksum,
                }
            )

    return media.mapInPandas(
        _batches,
        "doc_id long, media_type string, n_bytes long, mean_byte double, checksum long",
    )


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit one row per sampled
    offset (explode-shaped mapInPandas; a real impl would demux frames)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                if blob is None:
                    continue
                for off in range(0, len(blob), every_n_bytes):
                    rows.append((doc_id, off, blob[off]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_offset", "first_byte"])

    return media.filter(F.col("media_type") == "video/mp4").mapInPandas(
        _batches, "doc_id long, frame_offset int, first_byte int"
    )
