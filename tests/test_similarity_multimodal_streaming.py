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
    # doc_id=0 is an image: decoded pixel sum must equal the closed form
    row = feats.filter(F.col("doc_id") == 0).collect()[0]
    w, h = 16, 16  # _image_dims(0)
    n = w * h * 3
    expected = sum((0 * 7 + k) % 256 for k in range(n))
    assert (row.width, row.height, row.n_units, row.sum_units) == (w, h, n, expected)
    again = multimodal.extract_features(media).filter(F.col("doc_id") == 0).collect()[0]
    assert (row.mean_unit, row.sum_units) == (again.mean_unit, again.sum_units)


def test_bmp_wav_roundtrip():
    """Real container codecs: encode→decode identity, including BMP row
    padding (w=17 → stride 52 ≠ 51) and bottom-up ordering."""
    import numpy as np

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (9, 17, 3)).astype(np.uint8)
    assert np.array_equal(multimodal.decode_image(multimodal.encode_bmp(px)), px)
    s = rng.integers(-2048, 2048, 777).astype(np.int16)
    assert np.array_equal(multimodal.decode_audio(multimodal.encode_wav(s)), s)
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG0000000000000000000000000000")


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
    # identical aggregation applied as a plain batch job — ALL columns,
    # including the order-dependent first/last (min_by/max_by over the
    # total (ts, event_id) order)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    batch = rollup_stream.rollup_measures(ev)
    assert set(streamed.columns) == set(batch.columns)
    assert "first_cents" in streamed.columns and "last_cents" in streamed.columns
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_ivf_recall_and_pruning(spark):
    """IVF-Flat: probe scans a strict subset (nprobe/K of the table in
    expectation) and still recovers a meaningful share of the exact top-10;
    assignment is integer-exact so the partition order can't change it."""
    q = similarity.query_vector(spark, SF_SMALL, vec_id=0)
    exact = {
        r.vec_id for r in similarity.brute_force_topk(spark, SF_SMALL, q, 10).collect()
    }
    approx = {
        r.vec_id for r in similarity.ivf_topk(spark, SF_SMALL, q, 10).collect()
    }
    assert len(exact & approx) / 10 >= 0.2
    # pruning: the probed subset is strictly smaller than the table
    cents = similarity.ivf_centroids(spark, SF_SMALL)
    emb = similarity.load_embeddings(spark, SF_SMALL)
    dist_structs = ", ".join(
        f"named_struct('dist', {similarity._int_l2_expr('qv', similarity._int_vec_literal(c), duck=False)}, 'cid', {cid})"
        for cid, c in cents
    )
    assigned = emb.withColumn(
        "qv", F.expr(similarity._quant_expr("embedding", duck=False))
    ).withColumn("cl", F.expr(f"array_min(array({dist_structs})).cid"))
    sizes = {r.cl: r.n for r in assigned.groupBy("cl").count().withColumnRenamed("count", "n").collect()}
    assert sum(sizes.values()) == emb.count()
    assert len(sizes) > similarity.IVF_NPROBE  # more lists than probed
