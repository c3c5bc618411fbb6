"""Tier maintenance: age-based retention + small-file compaction.

The reference manages storage as monthly tables it can DROP wholesale
(``aisdb/database/dbconn.py:147``, ``:467`` — aggregate/monthly table
drops) and targets a TimescaleDB hypertable layout
(``aisdb/aisdb_sql/timescale_createtable_dynamic.sql:16-30``) whose
operational companions are ``drop_chunks`` (retention) and chunk
recompression (compaction). The Spark-first equivalents over the
day-partitioned parquet tiers written by ``checkpoint.write_tier``:

- :func:`enforce_retention` — drop whole ``bucket_date=`` partition
  directories older than a per-tier cutoff. Pure partition-metadata
  operation: nothing is scanned, cost ∝ partitions dropped, exactly like
  ``drop_chunks`` / ``DROP TABLE month``. Finer tiers keep shorter
  horizons than coarser ones (raw < 1min < 1h < 1d) — the tiered-retention
  contract of the north rule.
- :func:`compact_tier` — bin-pack fragmented day partitions (many small
  files, e.g. after many incremental ``upsert_batch`` merges) into
  ~``target_bytes`` files, content-preserved (row count + integer checksum
  asserted before/after), one partition at a time so the rewrite
  granularity — and failure blast radius — is a single day directory.
  Iceberg's ``rewrite_data_files`` expressed on plain parquet.

Both record what they did into the tier's ``_maintenance.json`` ledger
(append-only list of actions) — the lineage surface for audits; cutoffs
are explicit arguments (never wall-clock) so runs are deterministic and
testable.

Tiers addressed by URI (file://, hdfs://, s3a://) are supported since
round 5: listing, partition drops, stats, and the ledger ride the Hadoop
FileSystem client via ``streaming.fsio`` (an active SparkSession is
required for those paths); plain local paths keep the ``os`` fast path.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

LEDGER = "_maintenance.json"


def _spark_for(tier_dir: str):
    """Active session handle for Hadoop-FS paths (retention/ledger IO on
    hdfs:// / s3a:// tiers rides the JVM FileSystem client via
    streaming.fsio, same as the streaming upserts since round 5); plain
    local paths never touch the JVM."""
    from aisdb_spark.streaming import fsio

    return fsio.session_for(tier_dir)


def _append_ledger(tier_dir: str, entry: dict) -> None:
    spark = _spark_for(tier_dir)
    if spark is not None:
        from aisdb_spark.streaming import fsio

        log = fsio.read_side_json(spark, tier_dir, LEDGER) or []
        log.append(entry)
        fsio.write_side_json_atomic(spark, tier_dir, LEDGER, log)
        return
    path = os.path.join(tier_dir, LEDGER)
    log = []
    if os.path.exists(path):
        with open(path) as f:
            log = json.load(f)
    log.append(entry)
    with open(path, "w") as f:
        json.dump(log, f, indent=1)


def _date_partitions(tier_dir: str) -> list[tuple[_dt.date, str]]:
    spark = _spark_for(tier_dir)
    if spark is not None:
        from aisdb_spark.streaming import fsio

        names = [n for n, _sz, is_dir in fsio.list_entries(spark, tier_dir) if is_dir]
    elif os.path.isdir(tier_dir):
        names = os.listdir(tier_dir)
    else:
        return []
    out = []
    for name in sorted(names):
        if not name.startswith("bucket_date="):
            continue
        try:
            d = _dt.date.fromisoformat(name.split("=", 1)[1])
        except ValueError:
            continue
        out.append((d, f"{tier_dir.rstrip('/')}/{name}"))
    return out


def enforce_retention(
    tier_dirs: dict[str, str], cutoffs: dict[str, _dt.date]
) -> dict[str, list[str]]:
    """Drop day partitions strictly older than each tier's cutoff date.

    ``cutoffs`` maps tier name → first date to KEEP. Returns the dropped
    partition dates per tier. No Spark job runs — directory removal only
    (the reference's monthly DROP TABLE; TimescaleDB ``drop_chunks``).
    """
    dropped: dict[str, list[str]] = {}
    for tier, cutoff in cutoffs.items():
        tdir = tier_dirs.get(tier)
        if tdir is None:
            continue
        spark = _spark_for(tdir)
        gone = []
        for d, path in _date_partitions(tdir):
            if d < cutoff:
                if spark is not None:
                    from aisdb_spark.streaming import fsio

                    fsio.delete_dir(spark, path)
                else:
                    shutil.rmtree(path)
                gone.append(str(d))
        dropped[tier] = gone
        if gone:
            _append_ledger(
                tdir,
                {
                    "action": "retention_drop",
                    "cutoff": str(cutoff),
                    "dropped_partitions": gone,
                },
            )
    return dropped


def _partition_stats(path: str) -> tuple[int, int]:
    spark = _spark_for(path)
    if spark is not None:
        from aisdb_spark.streaming import fsio

        pq = [
            (n, sz)
            for n, sz, is_dir in fsio.list_entries(spark, path)
            if not is_dir and n.endswith(".parquet")
        ]
        return len(pq), sum(sz for _n, sz in pq)
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    return len(files), sum(os.path.getsize(f) for f in files)


def compact_tier(
    spark: SparkSession,
    tier_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
) -> dict:
    """Bin-pack fragmented day partitions of one tier.

    A partition is rewritten when its file count exceeds both
    ``min_files_to_compact`` and the ideal count ``ceil(bytes/target)``.
    The rewrite reads one day directory, coalesces to the ideal count, and
    overwrites that directory only (lineage truncated via localCheckpoint
    so the write never reads its own target). Content preservation is
    asserted with a row count + order-independent bit_xor(xxhash64) checksum before/after —
    a corrupted rewrite raises before anything is committed to the ledger.
    """
    actions = []
    for d, path in _date_partitions(tier_dir):
        n_files, nbytes = _partition_stats(path)
        ideal = max(1, math.ceil(nbytes / target_bytes))
        if n_files <= max(min_files_to_compact, ideal):
            continue
        df = spark.read.parquet(path)
        before = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*df.columns)).alias("chk"),
        ).collect()[0]
        packed = df.coalesce(ideal).localCheckpoint(eager=True)
        packed.write.mode("overwrite").parquet(path)
        after_df = spark.read.parquet(path)
        after = after_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*after_df.columns)).alias("chk"),
        ).collect()[0]
        if (before["n"], before["chk"]) != (after["n"], after["chk"]):
            raise RuntimeError(
                f"compaction checksum mismatch in {path}: "
                f"{tuple(before)} -> {tuple(after)}"
            )
        new_files, _ = _partition_stats(path)
        actions.append(
            {
                "partition": str(d),
                "files_before": n_files,
                "files_after": new_files,
                "bytes": nbytes,
            }
        )
    if actions:
        _append_ledger(tier_dir, {"action": "compact", "partitions": actions})
    return {"compacted": len(actions), "actions": actions}
