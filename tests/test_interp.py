"""Interpolation semantic-invariant tests — re-expression of the reference's
interp suite (aisdb/tests/test_008_interp.py:69-128: exact grid, exact
midpoint) plus EWMA-vs-pandas golden."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from aisdb_spark.operators import interp, segmentation


def _mk(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, value long",
    )


def test_interp_grid_exact_and_midpoint(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c", 0, "user", "a", None, base, 10),
        ("c", 1, "user", "b", None, base + dt.timedelta(seconds=3600), 30),
    ]
    segd = segmentation.gap_split(_mk(spark, rows), gap_seconds=7200)
    out = interp.interp_time(segd, step_seconds=1800).orderBy("ts").collect()
    # grid exactly [0, 1800, 3600] seconds (inclusive-end arange semantics)
    assert [r.ts for r in out] == [
        base,
        base + dt.timedelta(seconds=1800),
        base + dt.timedelta(seconds=3600),
    ]
    # midpoint is the exact linear midpoint (test_008_interp.py:69-91 analog)
    assert [r.value for r in out] == [10.0, 20.0, 30.0]


def test_interp_overhang_clamps(spark):
    """Last grid point past tn clamps to the boundary sample (np.interp
    clamping, aisdb/interp.py grid overhang)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c", 0, "user", "a", None, base, 0),
        ("c", 1, "user", "b", None, base + dt.timedelta(seconds=100), 100),
    ]
    segd = segmentation.gap_split(_mk(spark, rows), gap_seconds=7200)
    out = interp.interp_time(segd, step_seconds=60).orderBy("ts").collect()
    assert [r.value for r in out] == [0.0, 60.0, 100.0]
    assert out[-1].ts == base + dt.timedelta(seconds=120)


def test_interp_skips_single_turn(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [("solo", 0, "user", "a", None, base, 5)]
    segd = segmentation.gap_split(_mk(spark, rows), gap_seconds=7200)
    assert interp.interp_time(segd, 60).count() == 0


def test_interp_dedups_duplicate_ts(spark):
    """Duplicate timestamps keep the last turn (aisdb/interp.py:275-289)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c", 0, "user", "a", None, base, 0),
        ("c", 1, "user", "b", None, base, 999),  # same ts, later turn wins
        ("c", 2, "user", "c", None, base + dt.timedelta(seconds=60), 60),
    ]
    segd = segmentation.gap_split(_mk(spark, rows), gap_seconds=7200)
    out = interp.interp_time(segd, 30).orderBy("ts").collect()
    assert out[0].value == 999.0


def test_ewma_matches_pandas(spark):
    base = dt.datetime(2024, 1, 1)
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = [
        ("c", i, "user", "t", None, base + dt.timedelta(seconds=i), v)
        for i, v in enumerate(vals)
    ]
    out = (
        interp.ewma(_mk(spark, rows), alpha=0.3)
        .orderBy("turn_idx")
        .select("ewma_value")
        .collect()
    )
    expected = pd.Series(vals, dtype="float64").ewm(alpha=0.3, adjust=True).mean()
    np.testing.assert_allclose([r.ewma_value for r in out], expected.to_numpy(), rtol=1e-12)


def test_interp_time_expr_bit_equals_kernel(spark):
    """The pure-expression interp (registry version) must be bit-identical
    to the numpy reference kernel — same IEEE op order by construction."""
    from aisdb_spark.operators import interp, segmentation
    from aisdb_spark.queries import _tv
    from tests.conftest import SF_SMALL

    segd = segmentation.gap_split(_tv(spark, SF_SMALL), gap_seconds=3600)
    a = interp.interp_time_expr(segd, 600)
    b = interp.interp_time(segd, 600)
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
