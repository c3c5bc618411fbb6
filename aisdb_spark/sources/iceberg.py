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
