"""Multimodal columns: opaque ``binary`` payloads + typed metadata, with
REAL stdlib decode kernels, processed by Arrow-batched ``mapInPandas``.

Round 1 stubbed the decode step (no codec libraries in the container).
Round 2 uses self-describing formats that need no external codec:

- images are real 24-bpp BMP files (pure struct: 14-byte file header +
  40-byte BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) —
  ``encode_bmp``/``decode_image`` do the actual container work;
- audio is real PCM WAV via stdlib ``wave`` (16-bit mono);
- video stays an opaque byte payload (MP4 demux genuinely needs ffmpeg;
  the frame-sampling plumbing in :func:`sample_frames` is the real part).

Payload CONTENT is a deterministic arithmetic pattern of ``doc_id`` (byte k
of an image = ``(doc_id·7 + k) mod 256``, sample k of a wav =
``(doc_id·13 + k) mod 4096 − 2048``), so every extracted feature has a
closed-form integer value — the DuckDB oracle recomputes it from doc_id
alone, making the decode path end-to-end identity-checked: generator →
container encode → container decode → aggregate must equal the closed form.

Pattern precedent: the reference treats rasters/weather as opaque
environmental blobs resolved by lookup kernels (``aisdb/webdata/
load_raster.py``, ``aisdb/weather/data_store.py``); here the blob is the
row payload itself. The per-row Python in :func:`with_media` is fixture
generation (a real deployment reads files); the decode/feature kernels
operate on numpy views, not per-byte Python.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int"
)


# ---------------------------------------------------------------------------
# real container codecs (stdlib/struct only)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bpp BMP bytes (bottom-up, padded rows)."""
    h, w, _ = pixels.shape
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_raw] = pixels[::-1].reshape(h, row_raw)  # bottom-up
    return header + info + rows.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 array. Real struct parsing: magic check,
    pixel-array offset, dimensions, 4-byte row padding, bottom-up flip."""
    magic, _, _, _, off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if hdr_size < 40 or bpp != 24:
        raise ValueError(f"unsupported BMP variant (hdr={hdr_size}, bpp={bpp})")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3]
    return rows[::-1].reshape(h, w, 3).copy()


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes via stdlib wave."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes) -> np.ndarray:
    """WAV bytes → int16 sample array via stdlib wave."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("expected 16-bit mono PCM")
        return np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")


# deterministic payload patterns (shared with the DuckDB oracle)
def _image_dims(doc_id: int) -> tuple[int, int]:
    return int(doc_id % 64 + 16), int(doc_id % 48 + 16)  # (w, h)


def _n_samples(doc_id: int) -> int:
    return 1000 + int(doc_id % 500)


def _n_video_bytes(doc_id: int) -> int:
    return 256 + int(doc_id % 1024)


def with_media(docs: DataFrame) -> DataFrame:
    """Attach a real decodable payload per document, deterministic in
    doc_id: BMP (doc_id%3==0), WAV (%3==1), opaque video bytes (%3==2)."""

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                kind = d % 3
                if kind == 0:
                    w, h = _image_dims(d)
                    n = w * h * 3
                    px = ((d * 7 + np.arange(n)) % 256).astype(np.uint8)
                    out.append((d, encode_bmp(px.reshape(h, w, 3)), "image/bmp", w, h))
                elif kind == 1:
                    n = _n_samples(d)
                    s = ((d * 13 + np.arange(n)) % 4096 - 2048).astype(np.int16)
                    out.append((d, encode_wav(s), "audio/wav", 0, 0))
                else:
                    n = _n_video_bytes(d)
                    b = ((d * 31 + np.arange(n)) % 256).astype(np.uint8)
                    out.append((d, b.tobytes(), "video/mp4", 0, 0))
            yield pd.DataFrame(
                out, columns=["doc_id", "media", "media_type", "width", "height"]
            )

    ids = docs.select("doc_id")
    # Scale-adaptive scan spread (same rule as textops/similarity
    # _spread_scan): a small corpus arrives as one parquet row group →
    # one scan task → every payload generation AND the downstream
    # mapInPandas decode kernels run single-threaded. Repartition on
    # doc_id only when the scan has fewer partitions than cores; a large
    # corpus already scans in many splits and takes no extra shuffle.
    target = docs.sparkSession.sparkContext.defaultParallelism
    if ids.rdd.getNumPartitions() < target:
        ids = ids.repartition(target, "doc_id")
    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


_FEATURE_COLS = [
    "doc_id", "media_type", "width", "height",
    "n_units", "sum_units", "mean_unit",
]


def _stacked_sums(parts: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Lengths + per-part integer sums of variable-length arrays via ONE
    concatenated buffer and ``np.add.reduceat`` — the aggregation is a
    single vectorized pass regardless of blob count (parts are non-empty:
    every payload pattern has >= 256 units, asserted)."""
    lens = np.fromiter((p.size for p in parts), dtype=np.int64, count=len(parts))
    assert lens.min() > 0  # reduceat is ill-defined on empty segments
    flat = np.concatenate([p.ravel() for p in parts]).astype(np.int64, copy=False)
    starts = np.zeros(len(parts), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return lens, np.add.reduceat(flat, starts)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Per-payload feature extraction via mapInPandas — REAL decodes:
    BMP → pixel stats, WAV → sample stats, video → byte stats. All integer
    sums, so the identity oracle is hash-exact.

    Python per blob is ONLY the container decode (inherently per-payload —
    each blob is its own file); the feature aggregation is vectorized
    ACROSS all same-type blobs of the Arrow batch (one concatenated numpy
    buffer + reduceat per media_type), per the round-2 advice."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                yield pd.DataFrame(columns=_FEATURE_COLS)
                continue
            frames = []
            for mtype, sub in pdf.groupby("media_type", sort=False):
                if mtype == "image/bmp":
                    arrs = [decode_image(bytes(b)) for b in sub["media"]]
                    w = np.fromiter((a.shape[1] for a in arrs), np.int64, len(arrs))
                    h = np.fromiter((a.shape[0] for a in arrs), np.int64, len(arrs))
                elif mtype == "audio/wav":
                    arrs = [decode_audio(bytes(b)) for b in sub["media"]]
                    w = h = np.zeros(len(arrs), dtype=np.int64)
                else:
                    arrs = [
                        np.frombuffer(bytes(b), dtype=np.uint8)
                        for b in sub["media"]
                    ]
                    w = h = np.zeros(len(arrs), dtype=np.int64)
                lens, sums = _stacked_sums(arrs)
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": sub["doc_id"].to_numpy(),
                            "media_type": mtype,
                            "width": w,
                            "height": h,
                            "n_units": lens,
                            "sum_units": sums,
                            # vectorized IEEE division of exact ints —
                            # bit-equal to the oracle's CAST(..)/n
                            "mean_unit": sums / lens,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)[_FEATURE_COLS]

    return media.mapInPandas(
        _batches,
        "doc_id long, media_type string, width int, height int, "
        "n_units long, sum_units long, mean_unit double",
    )


def multimodal_oracle() -> str:
    """Closed-form DuckDB SQL for extract_features(with_media(documents)):
    recomputes each payload's integer sum from doc_id alone — equality
    proves the encode→decode round trip end-to-end."""
    return """WITH base AS (
  SELECT doc_id,
    CASE CAST(doc_id % 3 AS INTEGER)
      WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4'
    END AS media_type,
    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 64 + 16 AS INTEGER) ELSE 0 END AS width,
    CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 48 + 16 AS INTEGER) ELSE 0 END AS height,
    CASE CAST(doc_id % 3 AS INTEGER)
      WHEN 0 THEN (doc_id % 64 + 16) * (doc_id % 48 + 16) * 3
      WHEN 1 THEN 1000 + doc_id % 500
      ELSE 256 + doc_id % 1024
    END AS n_units,
    CASE CAST(doc_id % 3 AS INTEGER) WHEN 1 THEN doc_id * 13 ELSE
      CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN doc_id * 7 ELSE doc_id * 31 END
    END AS a,
    CASE CAST(doc_id % 3 AS INTEGER) WHEN 1 THEN 4096 ELSE 256 END AS m,
    CASE CAST(doc_id % 3 AS INTEGER) WHEN 1 THEN 2048 ELSE 0 END AS bias
  FROM documents
),
sums AS (
  SELECT *,
    -- sum of (a + k) % m for k in [0, n): full cycles + explicit remainder
    (n_units // m) * (m * (m - 1) // 2)
      + coalesce(list_sum(list_transform(range(CAST(n_units % m AS BIGINT)),
                                k -> (a + (n_units // m) * m + k) % m)), 0) AS mod_sum
  FROM base
)
SELECT doc_id, media_type, width, height,
  CAST(n_units AS BIGINT) AS n_units,
  CAST(mod_sum - bias * n_units AS BIGINT) AS sum_units,
  CAST(mod_sum - bias * n_units AS DOUBLE) / n_units AS mean_unit
FROM sums"""


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
