"""Transition edges: run-length segmentation on a categorical column +
per-run aggregates + edge emission.

Re-expresses AISdb's zone-transition graph builder
(``aisdb/network_graph.py:213-251``): where consecutive points change zone,
emit an edge row with per-visit aggregate statistics
(``_transitinfo``, ``aisdb/network_graph.py:84-210``); the final open
segment gets a NULL destination. Graft axis: ``role`` (or ``tool``)
transitions within a conversation.

Spark shape: lag-change flag → running-sum run id → groupBy(conv, run)
aggregates → lead(run role) for the edge destination. Two window passes and
one aggregation, all on the conv_id exchange — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_edges(df: DataFrame, key: str = "role") -> DataFrame:
    """One row per (conv_id, run of equal ``key``), with the next run's key
    as ``dst`` (NULL on the last run — AISdb's open-segment ``rcv_zone``).

    Measures per run: n_turns, sum_value, start/end turn_idx and ts,
    elapsed_us (exact integer) — the transit-statistics set of
    ``aisdb/network_graph.py:84-210`` on the transcript domain.
    Requires a ``value`` column.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # null-safe change detection (tool can be NULL; NULL-runs are runs too):
    # first row of each conversation always opens run 0.
    changed = (
        F.when(F.lag("turn_idx").over(w).isNull(), F.lit(1))
        .when(~F.col(key).eqNullSafe(F.lag(key).over(w)), F.lit(1))
        .otherwise(F.lit(0))
    )
    runs = df.withColumn(
        "_run",
        (F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast(
            "int"
        ),
    )
    per_run = runs.groupBy("conv_id", "_run").agg(
        F.min_by(key, "turn_idx").alias("src"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("value").alias("sum_value"),
        F.min("turn_idx").alias("start_turn_idx"),
        F.max("turn_idx").alias("end_turn_idx"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )
    rw = Window.partitionBy("conv_id").orderBy("_run")
    return (
        per_run.withColumn("dst", F.lead("src").over(rw))
        .withColumn(
            "elapsed_us",
            F.unix_micros(F.col("end_ts")) - F.unix_micros(F.col("start_ts")),
        )
        .withColumnRenamed("_run", "run_id")
    )
