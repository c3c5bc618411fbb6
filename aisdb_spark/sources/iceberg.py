"""Iceberg catalog integration (gated — the runtime jar is not in this
image; parquet layout in ``sources/tables.py`` is the tested fallback with
the identical pruning/clustering contract).

The production table spec below is the Spark re-expression of the
reference's TimescaleDB layout (``aisdb/aisdb_sql/timescale_createtable_
dynamic.sql:16-30``: hash-partition by entity, range-chunk by time,
compress per entity ordered by time):

- ``days(ts)`` partition ↔ 7-day hypertable chunks / monthly tables
- ``bucket(64, conv_id)`` ↔ ``partitioning_column => 'mmsi'``
- ``WRITE ORDERED BY conv_id, turn_idx`` ↔ clustered PK +
  ``compress_orderby = 'time ASC'``
- snapshot ids ↔ the checkpoint manifests in ``checkpoint.py``
  (``overwritePartitions()`` replaces the directory-overwrite writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPTS_DDL = """
CREATE TABLE IF NOT EXISTS {catalog}.{db}.transcripts (
  conv_id  STRING NOT NULL,
  turn_idx INT    NOT NULL,
  role     STRING,
  text     STRING,
  tool     STRING,
  ts       TIMESTAMP NOT NULL
)
USING iceberg
PARTITIONED BY (days(ts), bucket(64, conv_id))
TBLPROPERTIES (
  'write.parquet.compression-codec' = 'zstd',
  'write.distribution-mode' = 'hash',
  'write.target-file-size-bytes' = '134217728'
)
""".strip()

SORT_ORDER_DDL = (
    "ALTER TABLE {catalog}.{db}.transcripts "
    "WRITE ORDERED BY conv_id, turn_idx"
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001
        return True
    except Exception:
        return False


def create_transcripts_table(
    spark: SparkSession, catalog: str = "iceberg", db: str = "tsdb"
) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime jar not on the classpath — use "
            "sources.tables.write_transcripts_table (same layout, parquet)"
        )
    spark.sql(TRANSCRIPTS_DDL.format(catalog=catalog, db=db))
    spark.sql(SORT_ORDER_DDL.format(catalog=catalog, db=db))


def overwrite_partitions(df: DataFrame, table: str) -> None:
    """Idempotent per-partition replacement — the Iceberg twin of
    checkpoint.write_tier's directory overwrite."""
    df.writeTo(table).overwritePartitions()


# ---------------------------------------------------------------------------
# Transactional epoch-gated tier upsert (round-3 verdict item 2).
#
# The parquet path (streaming/upsert.py) applies a micro-batch with
# tier-write THEN an atomic ``_epoch.json`` rename; since round 5 the
# journaled partition swap (streaming/txn.py) rolls an uncommitted write
# back on replay, so that path is also effectively-once — at the cost of
# a recovery pass and backup renames. With an Iceberg catalog no recovery
# machinery is needed because both become ONE commit: the epoch id rides in the
# snapshot summary of the very ``overwritePartitions`` that applies the
# data, so a crash before the commit leaves old-data+old-epoch and a crash
# after leaves new-data+new-epoch — no in-between state exists. This is the
# Spark/Iceberg expression of the reference's transactional insert batches
# (``aisdb/aisdb_sql/insert_dynamic_clusteredidx.sql:16`` — ON CONFLICT
# inside one transaction). Exercised end-to-end by tests/
# test_iceberg_gate.py the moment a runtime jar appears; until then the
# logic is import-clean but unreachable in-sandbox.
# ---------------------------------------------------------------------------

EPOCH_PROP = "aisdb.epoch"


def last_applied_epoch_iceberg(spark: SparkSession, table: str) -> int:
    """Max epoch recorded in any snapshot summary of ``table`` (epochs are
    strictly increasing per checkpoint, so max == last applied). -1 when
    the table does not exist yet or never carried an epoch."""
    try:
        row = spark.sql(
            f"SELECT max(CAST(summary['{EPOCH_PROP}'] AS BIGINT)) "
            f"FROM {table}.snapshots"
        ).first()
        return -1 if row[0] is None else int(row[0])
    except Exception:
        return -1


def upsert_batch_iceberg(
    spark: SparkSession,
    turns: DataFrame,
    table: str,
    epoch_id: int | None = None,
) -> list:
    """Transactional twin of ``streaming.upsert.upsert_batch``: merge one
    micro-batch of raw turns into the partial-1min tier held in an Iceberg
    table, committing data + epoch atomically. Returns the affected days.

    The read of the existing partitions and the partition overwrite are
    snapshot-isolated (the scan pins the pre-commit snapshot), so no
    ``localCheckpoint`` lineage truncation is needed — the table format
    supplies what the parquet path had to fake."""
    from pyspark.sql import functions as F

    from aisdb_spark.streaming.upsert import (
        PARTIAL_COLS,
        merge_partials,
        partial_1min,
    )

    if epoch_id is not None and epoch_id <= last_applied_epoch_iceberg(
        spark, table
    ):
        return []
    newp = partial_1min(turns).withColumn(
        "bucket_date", F.to_date("bucket_start")
    ).persist()
    try:
        dates = [
            r[0] for r in newp.select("bucket_date").distinct().collect()
        ]
        if not dates:
            return []
        exists = spark.catalog.tableExists(table)
        merged = newp
        if exists:
            existing = spark.table(table).filter(
                F.col("bucket_date").isin(dates)  # partition-pruned scan
            )
            merged = merge_partials(
                existing.unionByName(newp).select(
                    "conv_id", "bucket_start", *PARTIAL_COLS
                )
            ).withColumn("bucket_date", F.to_date("bucket_start"))
        writer = merged.writeTo(table)
        if epoch_id is not None:
            writer = writer.option(
                f"snapshot-property.{EPOCH_PROP}", str(epoch_id)
            )
        if exists:
            writer.overwritePartitions()
        else:
            writer.partitionedBy(F.col("bucket_date")).create()
        return dates
    finally:
        newp.unpersist()
