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
    # full path: update-mode foreachBatch tier upsert + tier read-back
    streamed = rollup_stream.drained_rollup_1min(
        spark, str(landing), out_base=str(tmp_path / "out")
    )
    # identical aggregation applied as a plain batch job — ALL columns,
    # including the order-dependent first/last (min_by/max_by over the
    # total (ts, event_id) order)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    batch = rollup_stream.rollup_measures(ev)
    assert set(streamed.columns) == set(batch.columns)
    assert "first_cents" in streamed.columns and "last_cents" in streamed.columns
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_upsert_rollup_batch_replaces_keys(spark, tmp_path):
    """Update-mode semantics: a later batch's row for an existing
    (bucket_start, user_id) key REPLACES the stored row (the state store
    already merged; the tier must not re-aggregate), and untouched keys
    survive. Simulates two update-mode deliveries by hand."""
    from aisdb_spark.streaming import rollup_stream

    tier = str(tmp_path / "tier")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").cache()
    half = rollup_stream.rollup_measures(ev.filter(F.col("event_id") % 2 == 0))
    full = rollup_stream.rollup_measures(ev)
    rollup_stream.upsert_rollup_batch(spark, half, tier, epoch_id=0)
    # second delivery: the CURRENT state of every key the odd half touches
    touched = (
        ev.filter(F.col("event_id") % 2 == 1)
        .select(
            F.date_trunc("minute", "ts").alias("bucket_start"), "user_id"
        )
        .distinct()
    )
    rollup_stream.upsert_rollup_batch(
        spark, full.join(touched, ["bucket_start", "user_id"]), tier, epoch_id=1
    )
    got = spark.read.parquet(tier).select(*rollup_stream._ROLLUP_TIER_COLS)
    # keys never touched by odd events keep their half-batch row; all other
    # keys must equal the full aggregate → union of both, keyed replacement
    exp = full.join(touched, ["bucket_start", "user_id"]).unionByName(
        half.join(touched, ["bucket_start", "user_id"], "left_anti")
    ).select(*rollup_stream._ROLLUP_TIER_COLS)
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # replayed epoch is a no-op
    rollup_stream.upsert_rollup_batch(spark, half, tier, epoch_id=1)
    again = spark.read.parquet(tier).select(*rollup_stream._ROLLUP_TIER_COLS)
    assert again.exceptAll(exp).count() == 0 and exp.exceptAll(again).count() == 0


def test_upsert_sessions_batch_merge_moves_partition(spark, tmp_path):
    """A late partial that merges a session back into the previous day
    must relocate the merged row AND drop the emptied bucket_date
    partition (dynamic overwrite cannot delete a partition it writes
    nothing into)."""
    import datetime as dt
    import os

    from aisdb_spark.streaming import rollup_stream

    tier = str(tmp_path / "tier")

    def sess_df(rows):
        return spark.createDataFrame(
            rows, "user_id long, session_start timestamp, session_end timestamp,"
            " n_events long, sum_cents long"
        )

    d1, d2 = dt.datetime(2025, 3, 1, 23, 50), dt.datetime(2025, 3, 2, 0, 10)
    rollup_stream.upsert_sessions_batch(
        spark, sess_df([(7, d2, d2 + dt.timedelta(minutes=10), 3, 30)]),
        tier, epoch_id=0,
    )
    assert os.path.isdir(f"{tier}/bucket_date=2025-03-02")
    # late partial on day 1, within 30 min of the day-2 session → one
    # merged session starting on day 1
    rollup_stream.upsert_sessions_batch(
        spark, sess_df([(7, d1, d1 + dt.timedelta(minutes=5), 2, 20)]),
        tier, epoch_id=1,
    )
    got = spark.read.parquet(tier).select(*rollup_stream._SESSION_TIER_COLS)
    assert got.count() == 1
    row = got.first()
    assert (row.user_id, row.n_events, row.sum_cents) == (7, 5, 50)
    assert (row.session_start, row.session_end) == (
        d1, d2 + dt.timedelta(minutes=10)
    )
    assert not os.path.isdir(f"{tier}/bucket_date=2025-03-02")
    # a different user's session on day 2 is untouched by user 7's merges
    rollup_stream.upsert_sessions_batch(
        spark, sess_df([(9, d2, d2 + dt.timedelta(minutes=5), 1, 10)]),
        tier, epoch_id=2,
    )
    assert spark.read.parquet(tier).count() == 2
    # replayed epoch is a no-op
    rollup_stream.upsert_sessions_batch(
        spark, sess_df([(9, d2, d2 + dt.timedelta(minutes=5), 1, 10)]),
        tier, epoch_id=2,
    )
    assert spark.read.parquet(tier).count() == 2


def test_session_partial_merge_is_split_invariant(spark):
    """sessionize(A ∪ B) == merge(sessionize(A) ∪ sessionize(B)) for an
    adversarial split (event_id parity — every session interleaves), the
    algebra the session tier's upsert rests on."""
    from aisdb_spark.streaming import rollup_stream

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").cache()
    whole = rollup_stream.sessionize_events(ev)
    a = rollup_stream.sessionize_events(ev.filter(F.col("event_id") % 2 == 0))
    b = rollup_stream.sessionize_events(ev.filter(F.col("event_id") % 2 == 1))
    merged = rollup_stream.merge_session_partials(a.unionByName(b))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_session_window_append_emits_finalized_prefix(spark, tmp_path):
    """Native session_window in APPEND mode: every emitted session matches
    the batch twin exactly, and the only withheld rows are sessions the
    final watermark hasn't closed (end within watermark+gap of max ts) —
    the documented reason the registry drain sessionizes per micro-batch
    instead."""
    import shutil

    from aisdb_spark.streaming import rollup_stream

    landing = tmp_path / "landing"
    landing.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", landing / "events.parquet")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        rollup_stream.stream_user_sessions(spark, str(landing))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(out).select(
        "user_id", "session_start", "session_end", "n_events", "sum_cents"
    )
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    expected = rollup_stream.sessionize_events(ev)
    # emitted ⊆ expected, value-exact
    assert emitted.exceptAll(expected).count() == 0
    # withheld = only not-yet-finalized tail sessions
    import datetime as dt

    mx = ev.agg(F.max("ts")).first()[0]
    horizon = mx - dt.timedelta(minutes=40)  # watermark 10m + gap 30m
    missing = expected.exceptAll(emitted)
    assert missing.filter(F.col("session_end") < horizon).count() == 0


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


def test_upsert_sessions_long_span_widens_horizon(spark, tmp_path):
    """Round-3 verdict item 3 / round-4 ADVICE: a session spanning well
    past 24 h must NOT be silently split or duplicated by the bounded
    read window. The tier records its max session span (_horizon.json)
    and widens the read-back horizon adaptively, so a later partial that
    merges with a 60-hour session stored 3 days back still finds it."""
    import datetime as dt
    import json
    import os

    from aisdb_spark.streaming import rollup_stream

    tier = str(tmp_path / "tier")

    def sess_df(rows):
        return spark.createDataFrame(
            rows, "user_id long, session_start timestamp, session_end timestamp,"
            " n_events long, sum_cents long"
        )

    d1 = dt.datetime(2025, 3, 1, 0, 0)
    d3_noon = dt.datetime(2025, 3, 3, 12, 0)  # 60-hour partial
    rollup_stream.upsert_sessions_batch(
        spark, sess_df([(7, d1, d3_noon, 100, 1000)]), tier, epoch_id=0
    )
    with open(os.path.join(tier, "_horizon.json")) as f:
        assert json.load(f)["max_span_days"] == 2
    # late partial 20 min after the stored end, batch date = day 3: the
    # pre-widening window (start-2..start+1) would have missed day 1 where
    # the 60 h session is stored -> duplicate; the widened horizon reads it
    late_start = d3_noon + dt.timedelta(minutes=20)
    rollup_stream.upsert_sessions_batch(
        spark,
        sess_df([(7, late_start, late_start + dt.timedelta(minutes=10), 5, 50)]),
        tier, epoch_id=1,
    )
    got = spark.read.parquet(tier).select(*rollup_stream._SESSION_TIER_COLS)
    assert got.count() == 1  # one merged session, no duplicate/split
    row = got.first()
    assert (row.session_start, row.session_end, row.n_events, row.sum_cents) == (
        d1, late_start + dt.timedelta(minutes=10), 105, 1050
    )
    assert os.path.isdir(f"{tier}/bucket_date=2025-03-01")
    assert not os.path.isdir(f"{tier}/bucket_date=2025-03-03")


def test_session_merge_algebra_property(spark):
    """Hypothesis over random event sets and random micro-batch partitions
    (round-3 verdict item 7): merge(sessionize(parts)) == sessionize(union)
    for EVERY split, including the +-1-day partition boundary and the
    gap==30min boundary case (offsets are multiples of 15 min around a
    midnight, so exact-30-minute gaps occur constantly)."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings, strategies as st

    from aisdb_spark.streaming import rollup_stream

    base = dt.datetime(2025, 3, 1, 22, 0)  # 2h before a day boundary

    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(  # (user, 15-min slot, micro-batch assignment)
            st.tuples(
                st.integers(0, 1),
                st.integers(0, 24),
                st.integers(0, 2),
            ),
            min_size=1, max_size=12, unique=True,
        )
    )
    def run(evts):
        rows = [
            (i, u, base + dt.timedelta(minutes=15 * slot), part)
            for i, (u, slot, part) in enumerate(evts)
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, part int"
        ).withColumn("value", F.lit(1.0))
        whole = rollup_stream.sessionize_events(ev)
        parts = [
            rollup_stream.sessionize_events(ev.filter(F.col("part") == p))
            for p in range(3)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        merged = rollup_stream.merge_session_partials(u)
        assert merged.exceptAll(whole).count() == 0
        assert whole.exceptAll(merged).count() == 0

    run()


def test_neardup_r_self_sizing_rule():
    # the sizing rule the default path must follow (VERDICT r5 item 1):
    # r = max(4, ceil(log2(n / 32))) — bucket occupancy stays ~32 docs
    assert similarity.neardup_r_for(10**3) == 5
    assert similarity.neardup_r_for(10**6) == 15
    assert similarity.neardup_r_for(10**9) == 25
    assert similarity.neardup_r_for(500) == 4  # oracle corpus keeps r_min


def test_cosine_near_pairs_default_self_sizes(spark):
    # r=None derives neardup_r_for(count) inside the operator: on the
    # small corpus that equals the explicit value, so results must match
    n = similarity.load_embeddings(spark, SF_SMALL).count()
    r_auto = similarity.neardup_r_for(n)
    auto = {
        (r.vec1, r.vec2)
        for r in similarity.cosine_near_pairs(
            spark, SF_SMALL, threshold=0.45
        ).collect()
    }
    explicit = {
        (r.vec1, r.vec2)
        for r in similarity.cosine_near_pairs(
            spark, SF_SMALL, threshold=0.45, r=r_auto
        ).collect()
    }
    assert auto == explicit
