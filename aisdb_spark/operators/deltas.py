"""Pairwise delta series + rate filters — Window lag expressions.

Re-expresses AISdb's ``delta_seconds`` / ``delta_meters`` / ``delta_knots``
(``aisdb/gis.py:93-181``): per-entity time-ordered pairwise differences and
the derived rate ``dist / max(Δt, 1)``. Graft axes: Δts (inter-turn latency,
microsecond-exact) and Δvalue, with ``rate = Δvalue / max(Δt_s, 1)``.
Also the forward-speed filter ``min_speed_filter``
(``aisdb/track_gen.py:287-300``) as ``min_rate_filter``.

All pure Window expressions inside whole-stage codegen — no UDF, one
shuffle on conv_id shared with the rest of the per-conversation pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w() -> Window:
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def with_deltas(df: DataFrame) -> DataFrame:
    """Append ``delta_us`` (BIGINT μs since previous turn), ``delta_value``
    (BIGINT), and ``rate`` (value units / second, DOUBLE; Δt clamped to ≥1 s
    exactly like AISdb's ``max(Δt, 1)`` in delta_knots, aisdb/gis.py:150-181).
    First turn of each conversation has NULL deltas."""
    w = _w()
    dt_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    dv = F.col("value") - F.lag("value").over(w)
    rate = dv.cast("double") / F.greatest(
        F.floor(dt_us / F.lit(1_000_000)).cast("double"), F.lit(1.0)
    )
    return (
        df.withColumn("delta_us", dt_us)
        .withColumn("delta_value", dv)
        .withColumn("rate", rate)
    )


def min_rate_filter(df: DataFrame, min_rate: float) -> DataFrame:
    """Drop turns whose |rate| vs the previous turn is below ``min_rate``.

    Mirrors ``min_speed_filter`` (``aisdb/track_gen.py:287-300``) including
    its boundary behavior: the first turn (NULL delta) inherits the next
    delta's verdict — AISdb repeats the last delta to pad; we keep the first
    row when its *following* step passes (lead fallback)."""
    d = with_deltas(df).withColumn(
        "_eff",
        F.coalesce(F.abs(F.col("rate")), F.abs(F.lead("rate").over(_w()))),
    )
    return (
        d.filter((F.col("_eff") >= F.lit(min_rate)) | F.col("_eff").isNull())
        .drop("delta_us", "delta_value", "rate", "_eff")
    )
