"""Gorilla XOR + delta-of-delta codec over per-conversation series.

The physical-layout component the reference delegates to TimescaleDB:
``compress_segmentby = 'mmsi', compress_orderby = 'time ASC'``
(``aisdb/aisdb_sql/timescale_createtable_dynamic.sql:24-29``) — one
compressed blob per entity, ordered by time. Here the codec itself is
implemented (Facebook Gorilla, Pelkonen et al., VLDB 2015):

- timestamps: delta-of-delta with variable-width classes
  ``0`` (dod=0) | ``10``+16b | ``110``+32b | ``1110``+64b (zigzag),
  widened from the paper's second-resolution buckets to fit exact
  microsecond timestamps;
- values: IEEE-754 bits XOR previous; ``0`` (identical) |
  ``10`` (meaningful bits fit previous leading/length window) |
  ``11`` + 5b leading + 6b length + meaningful bits.

Encode side is numpy-vectorized (deltas, XORs, leading/trailing zero counts,
bit matrix assembly via ``np.packbits``); the only per-element work is the
sequential decode state machine — inherent to the format, bounded per
conversation. In Spark the codec runs inside ``applyInPandas`` groups
(Arrow-batched); a production deployment would swap the inner kernel for a
native library with the same wire format.

Scale: output is one row per conversation (segment) — the compressed
retention layer. Writing these blobs bucketed by conv_id gives the
TimescaleDB layout: hash-partition by entity, time-ordered within,
compressed per entity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# bit packing helpers (vectorized)
# ---------------------------------------------------------------------------


def _pack(vals: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack (value, width) pairs MSB-first into bytes, vectorized.

    Builds an (n, 64) bit matrix, keeps the low ``nbits`` of each row
    (MSB-first order within the field), flattens, packs.
    """
    n = len(vals)
    if n == 0:
        return b""
    v = vals.astype(np.uint64).reshape(-1, 1)
    shifts = np.arange(63, -1, -1, dtype=np.uint64).reshape(1, -1)
    bits = ((v >> shifts) & np.uint64(1)).astype(np.uint8)  # (n, 64) MSB..LSB
    # keep last nbits of each row
    keep = (np.arange(64, dtype=np.int64).reshape(1, -1)
            >= (64 - nbits.astype(np.int64)).reshape(-1, 1))
    flat = bits[keep]  # row-major → fields concatenated in order
    return np.packbits(flat).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, buf: bytes):
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        out = 0
        b = self.bits
        p = self.pos
        for i in range(n):
            out = (out << 1) | int(b[p + i])
        self.pos = p + n
        return out


def _zigzag(x: np.ndarray) -> np.ndarray:
    return ((x << 1) ^ (x >> 63)).astype(np.uint64)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ---------------------------------------------------------------------------
# timestamp stream: delta-of-delta
# ---------------------------------------------------------------------------

_TS_CLASSES = (  # (prefix_bits, prefix_val, payload_bits, payload_limit)
    (1, 0b0, 0),
    (2, 0b10, 16),
    (3, 0b110, 32),
    (4, 0b1110, 64),
)


def encode_ts(ts_us: np.ndarray) -> bytes:
    """int64 µs timestamps → header(n, t0, d0) + dod bitstream."""
    n = len(ts_us)
    head = np.array([n, ts_us[0] if n else 0, 0], dtype=np.int64)
    if n >= 2:
        head[2] = ts_us[1] - ts_us[0]
    if n <= 2:
        return head.tobytes()
    deltas = np.diff(ts_us)
    dod = np.diff(deltas)  # n-2 entries
    zz = _zigzag(dod)
    vals = np.zeros(len(dod), dtype=np.uint64)
    nbits = np.zeros(len(dod), dtype=np.int64)
    fits16 = zz < (1 << 16)
    fits32 = zz < (1 << 32)
    zero = zz == 0
    # class 0: '0'
    nbits[zero] = 1
    # class 1: '10' + 16
    m1 = ~zero & fits16
    vals[m1] = (np.uint64(0b10) << np.uint64(16)) | zz[m1]
    nbits[m1] = 18
    # class 2: '110' + 32
    m2 = ~zero & ~fits16 & fits32
    vals[m2] = (np.uint64(0b110) << np.uint64(32)) | zz[m2]
    nbits[m2] = 35
    # class 3: '1110' + 64-bit payload → exceeds one 64-bit field, so splice
    # each such entry in as two fields (4-bit prefix, 64-bit payload)
    m3 = ~zero & ~fits32
    if m3.any():
        chunks = []
        last = 0
        for i in np.where(m3)[0]:
            chunks.append((vals[last:i], nbits[last:i]))
            chunks.append((np.array([0b1110], dtype=np.uint64), np.array([4])))
            chunks.append((zz[i : i + 1], np.array([64])))
            last = i + 1
        chunks.append((vals[last:], nbits[last:]))
        vals = np.concatenate([c[0] for c in chunks])
        nbits = np.concatenate([c[1] for c in chunks])
    return head.tobytes() + _pack(vals, nbits)


def decode_ts(buf: bytes) -> np.ndarray:
    head = np.frombuffer(buf[:24], dtype=np.int64)
    n, t0, d0 = int(head[0]), int(head[1]), int(head[2])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array([t0], dtype=np.int64)
    out = np.empty(n, dtype=np.int64)
    out[0], out[1] = t0, t0 + d0
    r = _BitReader(buf[24:])
    delta = d0
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(16))
        elif r.read(1) == 0:
            dod = _unzigzag(r.read(32))
        else:
            r.read(1)  # the '0' of '1110'
            dod = _unzigzag(r.read(64))
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# ---------------------------------------------------------------------------
# value stream: XOR
# ---------------------------------------------------------------------------


def encode_vals(values: np.ndarray) -> bytes:
    """float64 values → header(n, v0 bits) + Gorilla XOR bitstream."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    head = np.array([n, v[0] if n else 0], dtype=np.uint64)
    if n <= 1:
        return head.tobytes()
    x = v[1:] ^ v[:-1]
    vals_list: list[tuple[int, int]] = []
    prev_lead, prev_len = -1, -1
    # exact leading/trailing-zero counts, vectorized binary descent
    lz = np.zeros(len(x), dtype=np.int64)
    tmp = x.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >> np.uint64(64 - shift) == 0
        lz[mask] += shift
        tmp[mask] <<= np.uint64(shift)
    tz = np.zeros(len(x), dtype=np.int64)
    tmp = x.copy()
    nz = tmp != 0
    for shift in (32, 16, 8, 4, 2, 1):
        mask = nz & ((tmp & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0)
        tz[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    tz[~nz] = 64
    for i in range(len(x)):  # sequential: window reuse is stateful
        xi = int(x[i])
        if xi == 0:
            vals_list.append((0, 1))
            continue
        li, ti = int(lz[i]), int(tz[i])
        li = min(li, 31)  # 5-bit leading field
        mlen = 64 - li - ti
        if (
            prev_lead >= 0
            and li >= prev_lead
            and (64 - prev_lead - prev_len) <= ti
        ):
            # '10' + meaningful bits in previous window (payload as own field:
            # control+payload can exceed 64 bits combined)
            mbits = (xi >> (64 - prev_lead - prev_len)) & ((1 << prev_len) - 1)
            vals_list.append((0b10, 2))
            vals_list.append((mbits, prev_len))
        else:
            # '11' + 5b lead + 6b len, then the payload field
            field = ((0b11 << 5) | li) << 6 | (mlen & 0x3F)  # mlen=64 → 0
            mbits = (xi >> ti) & ((1 << mlen) - 1)
            vals_list.append((field, 13))
            vals_list.append((mbits, mlen))
            prev_lead, prev_len = li, mlen
    vv = np.array([a for a, _ in vals_list], dtype=np.uint64)
    bb = np.array([b for _, b in vals_list], dtype=np.int64)
    return head.tobytes() + _pack(vv, bb)


def decode_vals(buf: bytes) -> np.ndarray:
    head = np.frombuffer(buf[:16], dtype=np.uint64)
    n = int(head[0])
    if n == 0:
        return np.empty(0, dtype=np.float64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = head[1]
    r = _BitReader(buf[16:])
    lead, mlen = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = out[i - 1]
            continue
        if r.read(1) == 1:
            lead = r.read(5)
            mlen = r.read(6)
            if mlen == 0:
                mlen = 64
        mbits = r.read(mlen)
        xi = mbits << (64 - lead - mlen)
        out[i] = out[i - 1] ^ np.uint64(xi)
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

_ENC_SCHEMA = (
    "conv_id string, n_points long, ts_blob binary, val_blob binary, "
    "raw_bytes long, enc_bytes long"
)
_ENC_CHUNKED_SCHEMA = (
    "conv_id string, chunk_id int, n_points long, ts_blob binary, "
    "val_blob binary, raw_bytes long, enc_bytes long"
)


def compress_conversations_chunked(
    df: DataFrame, max_rows: int = 50_000, shards: int | None = None
) -> DataFrame:
    """Per-(conversation, chunk) blobs with chunks of ≤ max_rows turns —
    the group-size cap for conversations that would exceed task memory
    (SURVEY.md §7 hard-point (d); AISdb's 50k batching precedent,
    aisdb_lib/src/decode.rs:19). Chunks are contiguous turn ranges, so
    decoding is blob-concatenation in chunk_id order; round-trip identity
    is tested in tests/test_codec.py."""
    from aisdb_spark.plans.partitioning import cap_group_size

    capped = cap_group_size(
        df.select("conv_id", "turn_idx", "ts", "value"), max_rows
    )

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "chunk_id", "turn_idx"], kind="stable")
        rows = []
        for (conv, chunk), g in pdf.groupby(["conv_id", "chunk_id"], sort=False):
            t = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            v = g["value"].to_numpy(dtype=np.float64)
            tb, vb = encode_ts(t), encode_vals(v)
            rows.append(
                (conv, chunk, len(g), tb, vb, len(g) * 16, len(tb) + len(vb))
            )
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id", "chunk_id", "n_points", "ts_blob", "val_blob",
                "raw_bytes", "enc_bytes",
            ],
        )

    spark = df.sparkSession
    n = shards or spark.sparkContext.defaultParallelism * 4
    return (
        capped.withColumn("_shard", F.pmod(F.hash("conv_id", "chunk_id"), F.lit(n)))
        .groupBy("_shard")
        .applyInPandas(lambda pdf: _shard(pdf.drop(columns=["_shard"])), _ENC_CHUNKED_SCHEMA)
    )


def decompress_conversations_chunked(enc: DataFrame) -> DataFrame:
    """Inverse of compress_conversations_chunked → (conv_id, ts, value);
    chunk order is restored by sorting blobs on (conv_id, chunk_id)."""

    def _batches(it):
        for pdf in it:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["conv_id", "chunk_id"], kind="stable")
            convs, tss, vss = [], [], []
            for conv, tb, vb in zip(pdf["conv_id"], pdf["ts_blob"], pdf["val_blob"]):
                t = decode_ts(bytes(tb))
                v = decode_vals(bytes(vb))
                convs.append(np.repeat(conv, len(t)))
                tss.append(t)
                vss.append(v)
            yield pd.DataFrame(
                {
                    "conv_id": np.concatenate(convs),
                    "ts": pd.to_datetime(np.concatenate(tss), unit="us"),
                    "value": np.concatenate(vss),
                }
            )

    return enc.mapInPandas(_batches, "conv_id string, ts timestamp, value double")


def compress_conversations(df: DataFrame, shards: int | None = None) -> DataFrame:
    """One compressed blob pair per conversation, ordered by turn_idx —
    the Timescale per-entity compression layout. Input needs ts + value.
    Emits per-entity lineage metrics (raw vs encoded bytes).

    Grouped by hash(conv_id) super-shards, with a pandas ``groupby`` over
    conversations inside each shard: JVM→Python group dispatch costs ~6 ms
    per group, so one applyInPandas group per *conversation* spent 29 s on
    dispatch alone at 10M turns / 150k convs; sharding amortizes it (same
    output, deterministic)."""

    def _shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
        rows = []
        for conv, g in pdf.groupby("conv_id", sort=False):
            t = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            v = g["value"].to_numpy(dtype=np.float64)
            tb, vb = encode_ts(t), encode_vals(v)
            rows.append((conv, len(g), tb, vb, len(g) * 16, len(tb) + len(vb)))
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id", "n_points", "ts_blob", "val_blob",
                "raw_bytes", "enc_bytes",
            ],
        )

    spark = df.sparkSession
    n = shards or spark.sparkContext.defaultParallelism * 4
    return (
        df.select("conv_id", "turn_idx", "ts", "value")
        .withColumn("_shard", F.pmod(F.hash("conv_id"), F.lit(n)))
        .groupBy("_shard")
        .applyInPandas(lambda pdf: _shard(pdf.drop(columns=["_shard"])), _ENC_SCHEMA)
    )


def compress_partitions(df: DataFrame, assume_partitioned: bool = False) -> DataFrame:
    """Zero-shuffle codec: encode directly over conv_id-partitioned data via
    ``mapInPandas`` with cross-batch carry-over.

    With storage bucketed by conv_id (the Iceberg ``bucket(64, conv_id)``
    layout / TimescaleDB ``partitioning_column => 'mmsi'``), every
    conversation is wholly contained in one partition — so compression
    needs NO exchange at all: sort within partitions, stream Arrow batches,
    hold back the possibly-incomplete tail conversation of each batch.
    ``assume_partitioned=False`` adds the hash exchange for arbitrary input.
    """
    base = df.select("conv_id", "turn_idx", "ts", "value")
    if not assume_partitioned:
        base = base.repartition("conv_id")
    base = base.sortWithinPartitions("conv_id", "turn_idx")

    def _encode_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv, g in pdf.groupby("conv_id", sort=False):
            t = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            v = g["value"].to_numpy(dtype=np.float64)
            tb, vb = encode_ts(t), encode_vals(v)
            rows.append((conv, len(g), tb, vb, len(g) * 16, len(tb) + len(vb)))
        return pd.DataFrame(
            rows,
            columns=[
                "conv_id", "n_points", "ts_blob", "val_blob",
                "raw_bytes", "enc_bytes",
            ],
        )

    def _parts(it):
        buf: pd.DataFrame | None = None
        for pdf in it:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # rows are (conv, turn) sorted: the last conversation may continue
            # in the next Arrow batch — hold it back
            last = pdf["conv_id"].iloc[-1]
            tail_start = pdf["conv_id"].searchsorted(last, side="left")
            body, buf = pdf.iloc[:tail_start], pdf.iloc[tail_start:]
            if len(body):
                yield _encode_frame(body)
        if buf is not None and len(buf):
            yield _encode_frame(buf)

    return base.mapInPandas(_parts, _ENC_SCHEMA)


def decompress_conversations(enc: DataFrame) -> DataFrame:
    """Inverse of compress_conversations → (conv_id, ts, value).

    ``mapInPandas`` (not groupBy): blobs are already one-row-per-entity, so
    decode is embarrassingly parallel per partition — no shuffle, no
    per-group dispatch overhead."""

    def _batches(it):
        for pdf in it:
            if pdf.empty:
                continue
            convs, tss, vss = [], [], []
            for conv, tb, vb in zip(
                pdf["conv_id"], pdf["ts_blob"], pdf["val_blob"]
            ):
                t = decode_ts(bytes(tb))
                v = decode_vals(bytes(vb))
                convs.append(np.repeat(conv, len(t)))
                tss.append(t)
                vss.append(v)
            yield pd.DataFrame(
                {
                    "conv_id": np.concatenate(convs),
                    "ts": pd.to_datetime(np.concatenate(tss), unit="us"),
                    "value": np.concatenate(vss),
                }
            )

    return enc.mapInPandas(_batches, "conv_id string, ts timestamp, value double")
