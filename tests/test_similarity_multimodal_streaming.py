"""ANN recall, multimodal plumbing, streaming-vs-batch rollup equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aisdb_spark import multimodal, similarity
from tests.conftest import SF_SMALL


def test_ann_recall_vs_brute_force(spark):
    """The driver's synthetic embeddings are isotropic-random — sign-LSH's
    worst case — so the bar here is structural: the probe must scan a strict
    subset of the table and still recover a meaningful share of the exact
    top-10 (clustered real-world embeddings recall far higher)."""
    q = similarity.query_vector(spark, SF_SMALL, vec_id=0)
    exact = {
        r.vec_id for r in similarity.brute_force_topk(spark, SF_SMALL, q, 10).collect()
    }
    approx = {
        r.vec_id
        for r in similarity.ann_topk(spark, SF_SMALL, q, 10, n_planes=4).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.3, f"ANN recall {recall} too low"
    # bucket pruning actually prunes
    import numpy as np
    from pyspark.sql import functions as F

    planes = similarity.hyperplanes(64, 4)
    emb = similarity.load_embeddings(spark, SF_SMALL).withColumn(
        "bucket", F.expr(similarity.lsh_bucket_expr(planes))
    )
    qv = np.asarray(q)
    qb = sum((1 << j) for j, p in enumerate(planes) if float(p @ qv) >= 0)
    probe = [qb] + [qb ^ (1 << j) for j in range(4)]
    scanned = emb.filter(F.col("bucket").isin(probe)).count()
    assert scanned < emb.count()


def test_multimodal_features_deterministic(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    media = multimodal.with_media(docs)
    feats = multimodal.extract_features(media)
    assert feats.count() == docs.count()
    row = feats.filter(F.col("doc_id") == 0).collect()[0]
    # payload is utf-8 text: n_bytes equals n_chars for ASCII corpus
    src = docs.filter(F.col("doc_id") == 0).collect()[0]
    assert row.n_bytes == len(src.text.encode())
    again = multimodal.extract_features(media).filter(F.col("doc_id") == 0).collect()[0]
    assert (row.mean_byte, row.checksum) == (again.mean_byte, again.checksum)


def test_multimodal_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_frame_sampling_only_video(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(30)
    media = multimodal.with_media(docs)
    frames = multimodal.sample_frames(media, every_n_bytes=64)
    vids = media.filter(F.col("media_type") == "video/mp4")
    assert frames.select("doc_id").distinct().count() == vids.count()
    one = vids.orderBy("doc_id").limit(1).collect()[0]
    got = frames.filter(F.col("doc_id") == one.doc_id).count()
    assert got == (len(bytes(one.media)) + 63) // 64


def test_stream_rollup_matches_batch(spark, tmp_path):
    from aisdb_spark.streaming import rollup_stream

    import shutil

    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", landing / "events.parquet")
    agg = rollup_stream.stream_rollup_1min(spark, str(landing))
    rollup_stream.drain_to_memory(agg, "s1")
    streamed = spark.sql("SELECT * FROM s1")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    batch = (
        ev.withColumn("cents", F.expr("CAST(round(value * 100) AS BIGINT)"))
        .groupBy(F.date_trunc("minute", "ts").alias("bucket_start"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
