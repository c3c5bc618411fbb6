"""Visvalingam-Whyatt decimation unit semantics (src/lib.rs:432-440)."""

from __future__ import annotations

import datetime as dt

from aisdb_spark.operators import downsample


def _df(spark, rows):
    return spark.createDataFrame(
        [
            ("c", i, dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=x), y)
            for i, (x, y) in enumerate(rows)
        ],
        "conv_id string, turn_idx int, ts timestamp, value long",
    )


def test_collinear_interior_points_are_dropped(spark):
    # zero-area interior points vanish at ANY positive threshold
    rows = [(0, 0), (1000, 10), (2000, 20), (3000, 30), (4000, 0)]
    got = downsample.vw_decimate(_df(spark, rows), min_area2=1).orderBy(
        "turn_idx"
    ).collect()
    assert [r.turn_idx for r in got] == [0, 3, 4]


def test_endpoints_always_survive(spark):
    rows = [(0, 0), (1000, 1), (2000, 0)]
    got = downsample.vw_decimate(_df(spark, rows), min_area2=10**12).collect()
    assert sorted(r.turn_idx for r in got) == [0, 2]


def test_threshold_zero_keeps_everything(spark):
    rows = [(0, 0), (500, 7), (1000, 3), (1500, 9)]
    got = downsample.vw_decimate(_df(spark, rows), min_area2=0).count()
    assert got == 4


def test_tie_breaks_to_lowest_index(spark):
    # two interior points with IDENTICAL minimal area: the machine removes
    # the lower index first, which changes the survivor set vs the other
    # order (after removing idx 1, idx 2's area grows past the threshold)
    rows = [(0, 0), (1000, 2), (2000, 0), (3000, 2), (4000, 0)]
    # areas(1)=areas(3)=|2000*2-0|*... symmetric; threshold between the
    # first-round area and the post-removal area isolates the order
    df = _df(spark, rows)
    a_first = 1000 * 2 * 2  # doubled area of idx1/idx3 triangles (x in ms)
    got = downsample.vw_decimate(df, min_area2=a_first + 1).orderBy(
        "turn_idx"
    ).collect()
    kept = [r.turn_idx for r in got]
    assert kept[0] == 0 and kept[-1] == 4
    # idx 1 (lowest) must be removed before idx 3
    assert 1 not in kept
