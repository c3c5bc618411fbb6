"""Gorilla codec: bit-level round-trip identity (FIXTURES.md golden #4),
pure-python fuzz + Spark end-to-end."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aisdb_spark.operators.codec import (
    decode_ts,
    decode_vals,
    encode_ts,
    encode_vals,
)


def test_codec_fuzz_roundtrip():
    rng = np.random.default_rng(7)
    for trial in range(60):
        n = int(rng.integers(0, 400))
        base = int(rng.integers(1_600_000_000_000_000, 1_800_000_000_000_000))
        steps = np.abs(
            rng.choice([1_000_000, 60_000_000, 1], size=max(n - 1, 0))
            + rng.integers(-500, 500, size=max(n - 1, 0))
        ) + 1
        ts = (
            np.concatenate([[base], base + np.cumsum(steps)]).astype(np.int64)[:n]
            if n
            else np.empty(0, dtype=np.int64)
        )
        assert np.array_equal(decode_ts(encode_ts(ts)), ts)
        v = rng.standard_normal(n)
        if n > 4:
            v[::5] = np.inf
            v[1::7] = -0.0
            v[2::11] = v[1::11][: len(v[2::11])]  # repeats → '0' control bits
        got = decode_vals(encode_vals(v))
        assert np.array_equal(
            got.view(np.uint64), np.ascontiguousarray(v).view(np.uint64)
        )


def test_codec_compresses_regular_series():
    ts = np.arange(5000, dtype=np.int64) * 60_000_000 + 1_700_000_000_000_000
    rng = np.random.default_rng(1)
    v = np.round(np.cumsum(rng.standard_normal(5000))).astype(np.float64)
    assert 5000 * 8 / len(encode_ts(ts)) > 20  # dod stream ~1 bit/point
    assert 5000 * 8 / len(encode_vals(v)) > 3


def test_spark_roundtrip_identity(spark, synth):
    from aisdb_spark.operators import codec, dedup
    from aisdb_spark.sources.transcripts import with_value

    tv = with_value(dedup.dedup_turns(synth)).filter(F.col("value").isNotNull())
    enc = codec.compress_conversations(tv)
    dec = codec.decompress_conversations(enc)
    src = tv.select("conv_id", "ts", F.col("value").cast("double").alias("value"))
    assert dec.count() == src.count()
    assert dec.exceptAll(src).count() == 0
    assert src.exceptAll(dec).count() == 0


def test_chunked_roundtrip_identity(spark, synth):
    """Oversized conversations are chunked (group-size cap) and the chunked
    blobs decode back to the identical series."""
    from aisdb_spark.operators import codec, dedup
    from aisdb_spark.sources.transcripts import with_value

    tv = with_value(dedup.dedup_turns(synth)).filter(F.col("value").isNotNull())
    enc = codec.compress_conversations_chunked(tv, max_rows=64)
    # the hot conversation (400 turns) must split into multiple chunks
    hot_chunks = enc.filter(F.col("conv_id") == "syn-001").count()
    assert hot_chunks >= 6
    dec = codec.decompress_conversations_chunked(enc)
    src = tv.select("conv_id", "ts", F.col("value").cast("double").alias("value"))
    assert dec.count() == src.count()
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0


def test_compress_partitions_zero_shuffle_identity(spark, synth):
    """The zero-shuffle (bucketed-storage) codec path produces the same
    blobs-decode-to-identity result as the grouped path."""
    from aisdb_spark.operators import codec, dedup
    from aisdb_spark.sources.transcripts import with_value

    tv = with_value(dedup.dedup_turns(synth)).filter(F.col("value").isNotNull())
    enc = codec.compress_partitions(tv)
    dec = codec.decompress_conversations(enc)
    src = tv.select("conv_id", "ts", F.col("value").cast("double").alias("value"))
    assert enc.count() == tv.select("conv_id").distinct().count()
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0
    # cross-batch carry-over actually exercised: force tiny Arrow batches
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        enc2 = codec.compress_partitions(tv)
        dec2 = codec.decompress_conversations(enc2)
        assert dec2.exceptAll(src).count() == 0 and src.exceptAll(dec2).count() == 0
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")


def test_shard_encoder_byte_identical_to_reference_kernel():
    """The vectorized whole-shard encoder must produce byte-identical blobs
    to the per-conversation reference kernel (same wire format, same strict
    window-reuse policy), and decode back exactly."""
    import numpy as np

    from aisdb_spark.operators import codec as C

    rng = np.random.default_rng(7)
    sizes = [1, 2, 3, 5, 400, 67, 80]
    ts_list, vs_list = [], []
    for m in sizes:
        t0 = int(rng.integers(1_700_000_000_000_000, 1_710_000_000_000_000))
        t = t0 + np.cumsum(rng.integers(1, 300_000_000, m))
        if m > 10:
            t[m // 2:] += 1 << 40  # force 64-bit dod class
        v = rng.integers(10, 300, m).astype(np.float64)
        if m > 5:
            v[2:5] = v[1]      # xor-zero runs
            v[m // 2] = 1e300  # violent window change
        ts_list.append(t.astype(np.int64))
        vs_list.append(v)
    tcat, vcat = np.concatenate(ts_list), np.concatenate(vs_list)
    starts = np.zeros(len(sizes), np.int64)
    starts[1:] = np.cumsum(sizes)[:-1]
    ends = starts + np.array(sizes)
    tbs = C.encode_ts_shard(tcat, starts, ends)
    vbs = C.encode_vals_shard(vcat, starts, ends)
    for g in range(len(sizes)):
        assert tbs[g] == C.encode_ts(ts_list[g])
        assert vbs[g] == C.encode_vals(vs_list[g])
        assert np.array_equal(C.decode_ts(tbs[g]), ts_list[g])
        assert np.array_equal(C.decode_vals(vbs[g]), vs_list[g])


def test_arrow_decode_equals_pandas_decode(spark, synth):
    from aisdb_spark.operators import codec, dedup
    from aisdb_spark.sources.transcripts import with_value

    tv = with_value(dedup.dedup_turns(synth)).filter(F.col("value").isNotNull())
    enc = codec.compress_conversations(tv).cache()
    via_pandas = codec.decompress_conversations(enc)
    via_arrow = codec.decompress_conversations_arrow(enc)
    assert via_arrow.schema == via_pandas.schema
    assert via_arrow.count() == via_pandas.count()
    assert via_arrow.exceptAll(via_pandas).count() == 0
    enc.unpersist()


def test_arrow_encoder_blob_identical_to_pandas_encoder(spark, synth):
    """mapInArrow encode (codec_arrow) must emit byte-identical blobs to the
    mapInPandas path — same wire format, same shard kernels."""
    from aisdb_spark.operators import codec, codec_arrow, dedup
    from aisdb_spark.sources.transcripts import with_value

    tv = with_value(dedup.dedup_turns(synth)).filter(F.col("value").isNotNull())
    a = {
        r["conv_id"]: (bytes(r["ts_blob"]), bytes(r["val_blob"]), r["n_points"])
        for r in codec_arrow.compress_partitions_arrow(tv).collect()
    }
    b = {
        r["conv_id"]: (bytes(r["ts_blob"]), bytes(r["val_blob"]), r["n_points"])
        for r in codec.compress_partitions(tv).collect()
    }
    assert a == b and len(a) > 0


def test_fused_roundtrips_equal_two_stage(spark, synth):
    """The round-6 fused encode→decode stages (one Python stage per
    variant) return exactly the rows of the two-stage pipelines they
    replace in gorilla_roundtrip."""
    from aisdb_spark.operators import codec, codec_arrow, dedup
    from aisdb_spark.sources.transcripts import with_value

    tv = with_value(dedup.dedup_turns(synth)).filter(F.col("value").isNotNull())

    two_stage_arrow = codec.decompress_conversations_arrow(
        codec_arrow.compress_partitions_arrow(tv)
    )
    fused_arrow = codec_arrow.roundtrip_partitions_arrow(tv)
    assert fused_arrow.exceptAll(two_stage_arrow).count() == 0
    assert two_stage_arrow.exceptAll(fused_arrow).count() == 0

    two_stage_chunked = codec.decompress_conversations_chunked(
        codec.compress_conversations_chunked(tv, max_rows=40)
    )
    fused_chunked = codec.roundtrip_conversations_chunked(tv, max_rows=40)
    assert fused_chunked.exceptAll(two_stage_chunked).count() == 0
    assert two_stage_chunked.exceptAll(fused_chunked).count() == 0
