"""Per-conversation mode aggregation → conv_meta (static-aggregate analog).

AISdb builds ``static_{YYYYMM}_aggregate`` by looping DISTINCT mmsis and
taking ``Counter(...).most_common(1)`` per column with null padding
(``aisdb/database/dbconn.py:110-197``) — a driver-side loop that would never
scale. Spark-first replacement: one distributed count-group + row_number
pick, fully shuffled-parallel, with a *deterministic* tie-break
(count DESC, value ASC) — Python's ``Counter.most_common`` ties are
insertion-ordered, which is irreproducible across partitionings; a total
order is required for the byte-match guarantee.

Scale: two shuffles ((conv, col-value) count, then conv window), both
map-side combined; output is one row per conversation — the broadcast-side
table for downstream enrichment joins (``aisdb/aisdb_sql/
select_join_dynamic_static_clusteredidx.sql:1-31``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mode_of(df: DataFrame, col: str, skip_nulls: bool = True) -> DataFrame:
    """→ (conv_id, mode_<col>): most frequent value, ties to smallest."""
    d = df.filter(F.col(col).isNotNull()) if skip_nulls else df
    counted = d.groupBy("conv_id", col).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy("conv_id").orderBy(F.col("_c").desc(), F.col(col).asc())
    return (
        counted.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("conv_id", F.col(col).alias(f"mode_{col}"))
    )


def conv_meta(df: DataFrame) -> DataFrame:
    """Per-conversation static attributes: mode role, mode tool, first ts,
    turn count, total value — the static-aggregate table of the graft."""
    base = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts").alias("created_ts"),
        F.sum("value").alias("total_value"),
    )
    roles = mode_of(df, "role")
    tools = mode_of(df, "tool")
    # conv-keyed joins of conv-sized frames: Catalyst plans these as a
    # shuffled join sharing the conv_id exchange; at sf scale AQE may
    # broadcast the smaller sides.
    return base.join(roles, "conv_id", "left").join(tools, "conv_id", "left")
