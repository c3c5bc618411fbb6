"""Arrow-native Gorilla codec surface — ``mapInArrow`` both directions.

SURVEY.md §7 step 7 promises the Gorilla XOR + delta-of-delta codec "inside
mapInArrow"; this module delivers the encode side (decode lives in
``codec.decompress_conversations_arrow``). Compared to the
``mapInPandas`` path (``codec.compress_partitions``):

- input RecordBatches are consumed as numpy views directly (timestamps are
  a zero-copy int64 view, values zero-copy float64) — no pandas
  DataFrame/Index materialization per batch;
- rows arrive (conv_id, turn_idx)-sorted from the JVM sort, so there is no
  Python-side sort at all;
- output blobs are handed back as Arrow binary arrays.

Same wire format, same shard kernels (``encode_ts_shard`` /
``encode_vals_shard``), byte-identical output — asserted in
tests/test_codec.py. Cross-batch conversation tails are carried exactly
like the pandas path (hold back the final run of each batch).

Reference parity: the per-entity compression layout of TimescaleDB
(``aisdb/aisdb_sql/timescale_createtable_dynamic.sql:16-30``) with the
Gorilla/Facebook bit formats (delta-of-delta timestamps, XOR values).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from aisdb_spark.operators.codec import (
    _ENC_SCHEMA,
    encode_ts_shard,
    encode_vals_shard,
)

_OUT = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("n_points", pa.int64()),
        pa.field("ts_blob", pa.binary()),
        pa.field("val_blob", pa.binary()),
        pa.field("raw_bytes", pa.int64()),
        pa.field("enc_bytes", pa.int64()),
    ]
)


def _encode_block(conv: np.ndarray, t: np.ndarray, v: np.ndarray) -> pa.RecordBatch:
    """Encode one sorted (conv, t, v) block → one output row per conv."""
    n = len(conv)
    change = np.flatnonzero(conv[1:] != conv[:-1]) + 1
    starts = np.concatenate([[0], change]).astype(np.int64)
    ends = np.concatenate([starts[1:], [n]]).astype(np.int64)
    tbs = encode_ts_shard(t, starts, ends)
    vbs = encode_vals_shard(v, starts, ends)
    counts = ends - starts
    return pa.RecordBatch.from_arrays(
        [
            pa.array(conv[starts].tolist(), type=pa.string()),
            pa.array(counts),
            pa.array(tbs, type=pa.binary()),
            pa.array(vbs, type=pa.binary()),
            pa.array(counts * 16),
            pa.array(
                [len(a) + len(b) for a, b in zip(tbs, vbs)], type=pa.int64()
            ),
        ],
        schema=_OUT,
    )


def _prep_sorted(df: DataFrame, assume_partitioned: bool) -> DataFrame:
    """(conv_id, ts, value) sorted within conv-hashed partitions — the
    shared JVM-side prep for the encode and fused-roundtrip stages."""
    base = df.select("conv_id", "turn_idx", "ts", "value")
    if not assume_partitioned:
        # explicit-count repartition: a bare repartition("conv_id") is a
        # REPARTITION_BY_COL shuffle that AQE coalesces for JVM-sized
        # partitions (~1 MB floor) — at bench scale that serializes the
        # whole encode on one Python worker. Pin the pre-AQE ceiling
        # (spark.sql.shuffle.partitions, conf-derived — a cluster sets it
        # to 2-3x total cores) so the Python stage keeps its parallelism.
        spark = df.sparkSession
        n = max(
            int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
            spark.sparkContext.defaultParallelism,
        )
        base = base.repartition(n, "conv_id")
    return base.sortWithinPartitions("conv_id", "turn_idx").select(
        "conv_id", "ts", "value"
    )


def _encode_batches(it):
    """Encoded RecordBatch generator over sorted input batches, with
    cross-batch conversation-tail carry-over."""

    def _np_cols(rb: pa.RecordBatch):
        conv = np.asarray(rb.column(0).to_numpy(zero_copy_only=False))
        ts = rb.column(1)
        if isinstance(ts.type, pa.TimestampType):
            ts = ts.cast(pa.timestamp("us"))
        t = np.asarray(ts.to_numpy(zero_copy_only=False)).astype(
            "datetime64[us]", copy=False
        ).view(np.int64)
        v = np.ascontiguousarray(
            rb.column(2).to_numpy(zero_copy_only=False), dtype=np.float64
        )
        return conv, t, v

    carry = None
    for rb in it:
        if rb.num_rows == 0:
            continue
        conv, t, v = _np_cols(rb)
        if carry is not None:
            conv = np.concatenate([carry[0], conv])
            t = np.concatenate([carry[1], t])
            v = np.concatenate([carry[2], v])
        # the final conversation may continue in the next batch
        not_last = np.flatnonzero(conv != conv[-1])
        tail_start = int(not_last[-1]) + 1 if len(not_last) else 0
        body = (conv[:tail_start], t[:tail_start], v[:tail_start])
        carry = (conv[tail_start:], t[tail_start:], v[tail_start:])
        if tail_start:
            yield _encode_block(*body)
    if carry is not None and len(carry[0]):
        yield _encode_block(*carry)


def compress_partitions_arrow(
    df: DataFrame, assume_partitioned: bool = False
) -> DataFrame:
    """Zero-shuffle Arrow-native encoder: sortWithinPartitions (JVM) →
    ``mapInArrow`` with cross-batch tail carry-over. See
    ``codec.compress_partitions`` for the partitioning contract."""
    return _prep_sorted(df, assume_partitioned).mapInArrow(
        _encode_batches, _ENC_SCHEMA
    )


def roundtrip_partitions_arrow(
    df: DataFrame, assume_partitioned: bool = False
) -> DataFrame:
    """Arrow encode → decode fused into ONE ``mapInArrow`` stage (guide
    §4: the two-stage form ships every encoded blob JVM→Python→JVM→Python
    just to decode it again; composing the generators keeps the blobs
    inside the worker that built them). Bytes and rows are identical to
    ``decompress_conversations_arrow(compress_partitions_arrow(df))`` —
    the same ``_encode_batches`` output feeds the same
    ``decode_enc_batches_arrow`` (asserted in tests/test_codec.py)."""
    from aisdb_spark.operators.codec import decode_enc_batches_arrow

    def _fused(it):
        yield from decode_enc_batches_arrow(_encode_batches(it))

    return _prep_sorted(df, assume_partitioned).mapInArrow(
        _fused, "conv_id string, ts timestamp, value double"
    )
