"""Materialized transcripts table: the storage layout of the engine.

Reproduces the reference's physical doctrine — monthly tables / hypertable
chunks clustered by (entity, time) (``aisdb/aisdb_sql/createtable_dynamic_
clustered.sql:13``, ``timescale_createtable_dynamic.sql:16-22``) — as a
date-partitioned parquet table sorted by (conv_id, turn_idx) within
partitions. With an Iceberg catalog this becomes
``PARTITIONED BY (days(ts), bucket(N, conv_id)) WRITE ORDERED BY conv_id,
turn_idx`` — identical pruning/clustering contract; parquet is the
sandbox fallback (Iceberg jars are not in the image).

Why it matters: the derivation CTE computes ``turn_idx`` with a window, so
time predicates cannot push below it (they would change turn numbering).
Against the *materialized* table the same predicate reaches the scan as a
partition filter + row-group filter — see tests/test_tables.py asserting
``PartitionFilters``/``PushedFilters`` in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aisdb_spark.sources.normalize import read_parquet


def write_transcripts_table(df: DataFrame, path: str) -> None:
    """Day-partitioned, (conv_id, turn_idx)-clustered materialization."""
    (
        df.withColumn("ts_date", F.to_date("ts"))
        .repartition("ts_date")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("ts_date")
        .parquet(path)
    )


def read_transcripts_table(spark: SparkSession, path: str) -> DataFrame:
    return read_parquet(spark, path).drop("ts_date")


def time_filtered(spark: SparkSession, path: str, start: str, end: str) -> DataFrame:
    """in_timerange against the materialized table — partition pruning on
    ts_date + row-group pushdown on ts (the month-list pruning of
    aisdb/database/sqlfcn_callbacks.py:17-20, done by the engine)."""
    df = read_parquet(spark, path)
    return df.filter(
        (F.col("ts_date") >= F.to_date(F.lit(start)))
        & (F.col("ts_date") <= F.to_date(F.lit(end)))
        & F.col("ts").between(start, end)
    ).drop("ts_date")
