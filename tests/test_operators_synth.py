"""Operator unit tests on the deterministic synthetic fixture — the graft
re-expression of AISdb's structural/golden-value test strategy
(aisdb/tests/test_007_trackgen.py, test_008_interp.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aisdb_spark.operators import dedup, rollup, segmentation, transitions
from aisdb_spark.sources.transcripts import with_value


def test_dedup_removes_synth_duplicates(synth):
    before = synth.count()
    deduped = dedup.dedup_turns(synth)
    after = deduped.count()
    # synth injects exactly 2 duplicate (conv_id, turn_idx) rows (conv syn-002)
    assert before - after == 2
    # winner is deterministic: earliest ts → original rows survive, so the
    # per-turn text equality invariant holds (no 'dup-row'/'dup-ts' texts)
    texts = {
        r.text
        for r in deduped.filter(
            (F.col("conv_id") == "syn-002") & (F.col("turn_idx") <= 1)
        ).collect()
    }
    assert "dup-row" not in texts and "dup-ts" not in texts


def test_gap_split_golden_boundaries(spark):
    """Hand-built conversation with known gap positions — exact segment ids,
    mirroring AISdb's split-index golden asserts (aisdb/proc_util.py:53-68:
    split at diff >= threshold)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c", 0, "user", "a", None, base),
        ("c", 1, "user", "b", None, base + dt.timedelta(seconds=10)),
        ("c", 2, "user", "c", None, base + dt.timedelta(seconds=3610)),  # gap >= 1h
        ("c", 3, "user", "d", None, base + dt.timedelta(seconds=3620)),
        ("c", 4, "user", "e", None, base + dt.timedelta(seconds=7220)),  # exactly 3600
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {
        r.turn_idx: r.segment_id
        for r in segmentation.gap_split(df, gap_seconds=3600).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_rollup_cascade_composes_on_synth(synth):
    """Each coarser tier must equal direct aggregation from raw — the
    continuous-aggregate invariant (FIXTURES.md golden #2)."""
    tv = with_value(dedup.dedup_turns(synth))
    t1m = rollup.temporal_bin(tv, "minute")
    via_cascade = rollup.tier_from_finer(t1m, "hour")
    direct = rollup.temporal_bin(tv, "hour")
    assert via_cascade.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_cascade).count() == 0
    d_cascade = rollup.tier_from_finer(via_cascade, "day")
    d_direct = rollup.temporal_bin(tv, "day")
    assert d_cascade.exceptAll(d_direct).count() == 0
    assert d_direct.exceptAll(d_cascade).count() == 0


def test_min_segment_length_drop(synth):
    tv = with_value(dedup.dedup_turns(synth))
    seg = segmentation.multi_criteria_split(
        tv, gap_seconds=3600, max_value_jump=None, min_segment_length=2
    )
    assert seg.filter(F.col("segment_len") < 2).count() == 0
    # the single-turn conversation syn-000 is dropped entirely
    assert seg.filter(F.col("conv_id") == "syn-000").count() == 0


def test_transition_edges_cover_all_turns(synth):
    tv = with_value(dedup.dedup_turns(synth))
    edges = transitions.transition_edges(tv, key="role")
    assert edges.agg(F.sum("n_turns")).collect()[0][0] == tv.count()
    # exactly one open (dst NULL) run per conversation
    last = edges.filter(F.col("dst").isNull()).groupBy("conv_id").count()
    assert last.filter(F.col("count") != 1).count() == 0


def test_text_equality_through_pipeline(synth):
    """Per-turn text byte-equality under stable (conv_id, turn_idx) ordering
    survives dedup → segmentation → enrichment (the north-rule invariant)."""
    tv = with_value(dedup.dedup_turns(synth))
    out = segmentation.gap_split(tv, 3600).select("conv_id", "turn_idx", "text")
    src = tv.select(
        "conv_id", "turn_idx", F.col("text").alias("text_src")
    )
    joined = out.join(src, ["conv_id", "turn_idx"], "full")
    bad = joined.filter(
        ~(F.col("text").eqNullSafe(F.col("text_src")))
    ).count()
    assert bad == 0


def test_asof_cumulative_count_edges(spark):
    """Distributed prefix-sum as-of: exact cumulative counts, NULL before the
    first reference, ties inclusive (ref at probe ts counts), empty ref."""
    import datetime as dt

    from aisdb_spark.operators import asof

    T = dt.datetime
    ref = spark.createDataFrame(
        [(T(2024, 1, 1, 0, 5),), (T(2024, 1, 1, 0, 5),), (T(2024, 1, 1, 2, 0),),
         (T(2024, 1, 1, 9, 30),)],
        "ts timestamp",
    )
    probe = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0)),   # before first ref -> NULL
         (2, T(2024, 1, 1, 0, 5)),   # tie: both 00:05 refs count -> 2
         (3, T(2024, 1, 1, 1, 0)),   # between -> 2
         (4, T(2024, 1, 1, 5, 0)),   # empty-bucket fallback to offset -> 3
         (5, T(2024, 1, 2, 0, 0))],  # after last -> 4
        "pid int, ts timestamp",
    )
    out = {
        r.pid: r.cum
        for r in asof.asof_cumulative_count(
            spark, probe, ref, out_col="cum", n_buckets=7
        ).collect()
    }
    assert out == {1: None, 2: 2.0, 3: 2.0, 4: 3.0, 5: 4.0}
    # empty reference: all NULL
    empty = ref.filter("1=0")
    out2 = asof.asof_cumulative_count(spark, probe, empty, out_col="cum")
    assert [r.cum for r in out2.collect()] == [None] * 5


def test_asof_broadcast_size_guard(spark, monkeypatch):
    """Round-4 verdict item 5: asof_lookup_broadcast driver-collects the
    reference into a broadcast — correct for dim-sized series, an OOM for
    table-sized ones. Above ASOF_BROADCAST_MAX it must fail loudly with a
    pointer to the distributed asof_join_keyed, and still work at the
    bound."""
    import numpy as np
    import pytest as _pytest

    from aisdb_spark.operators import asof

    left = spark.createDataFrame(
        [(1, "2025-03-01 00:00:05")], "id long, ts_s string"
    ).selectExpr("id", "CAST(ts_s AS timestamp) AS ts")
    monkeypatch.setattr(asof, "ASOF_BROADCAST_MAX", 4)
    # at the bound: fine
    ok = asof.asof_lookup_broadcast(
        spark, left, np.arange(4, dtype=np.int64), np.arange(4.0)
    )
    assert ok.count() == 1
    with _pytest.raises(ValueError, match="asof_join_keyed"):
        asof.asof_lookup_broadcast(
            spark, left, np.arange(5, dtype=np.int64), np.arange(5.0)
        )
