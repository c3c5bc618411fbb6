"""Time-in-value-band via gap sessionization.

Re-expresses AISdb's depth-band dwell-time metric
(``aisdb/network_graph.py:51-67``): filter points whose value lies in
[lo, hi], segment the surviving time vector at gaps > ``gap_seconds``
(AISdb uses 1 minute), and total the elapsed time of each contiguous run.

All integer-exact (microsecond sums), pure filter + window + two
aggregations — deterministic across engines and parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_in_range(
    df: DataFrame,
    lo: int,
    hi: int,
    gap_seconds: int = 60,
) -> DataFrame:
    """→ (conv_id, n_points, n_sessions, total_us, total_minutes)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    banded = df.filter(F.col("value").between(F.lit(lo), F.lit(hi)))
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flag = F.when(gap_us > int(gap_seconds) * 1_000_000, F.lit(1)).otherwise(F.lit(0))
    sess = banded.withColumn(
        "_sess", F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_sess = sess.groupBy("conv_id", "_sess").agg(
        F.count(F.lit(1)).alias("n"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    return per_sess.groupBy("conv_id").agg(
        F.sum("n").alias("n_points"),
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("dur_us").alias("total_us"),
        F.floor(F.sum("dur_us") / F.lit(60_000_000)).alias("total_minutes"),
    )
