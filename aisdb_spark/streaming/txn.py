"""Journaled partition-swap commit for tier upserts.

Closes the crash window rounds 1-4 documented between a tier's dynamic
partition overwrite finishing and the ``_epoch.json`` record landing
(``upsert.py`` module docstring: "closing that window needs a
transactional table format"). It doesn't, quite: the parquet path gets
the same effectively-once contract from a write-ahead journal, because
the epoch record itself is an atomic rename and can serve as the commit
point. The protocol, per micro-batch:

1. journal ``_txn.json`` ``{epoch, backed, cleared}`` (atomic rename);
2. rename every touched partition that exists into ``_txn_backup/``
   (metadata-only on local/HDFS; the ``_`` prefix hides both journal
   and backups from parquet scans and :func:`fsio.tier_nonempty`);
3. write the new partitions — every pre-image is renamed away, so the
   write lands in empty slots, and a touched partition with no output
   rows simply ceases to exist (emptied-partition cleanup is free,
   replacing the local-fs-only ``shutil.rmtree`` pass);
4. record the epoch in ``_epoch.json``  ← THE commit point;
5. delete the journal, then the backups.

:func:`recover` (run at the top of every upsert) arbitrates any crash
by comparing the journal's epoch against the recorded one: already
recorded → the commit happened, finish step 5; not recorded → it did
not, delete write debris and rename the backups home, restoring the
exact pre-batch tier for the checkpointed source's replay of the same
epoch. Recovery is idempotent: a backup either still exists (restore
it) or the original is already in place (leave it), per partition, so
a crash during recovery — or during an S3-style copy+delete rename —
re-arbitrates identically. With ``epoch_id=None`` (hand-driven callers
outside a streaming checkpoint) the journal still keeps the tier
consistent, but the commit point degrades to the journal deletion: a
crash after the write rolls the batch back — at-most-once, documented.

Scale: the journal lists touched dates only (∝ batch, never table),
the swap is rename-only, and recovery touches only journaled
partitions. Reference parity: AISdb's tables absorb replayed inserts
with PK dedup (aisdb/aisdb_sql/insert_dynamic_clusteredidx.sql:16) and
its ingest never replays a partial transaction; Spark's at-least-once
file source needs exactly this idempotent apply. The Iceberg writer
(``sources/iceberg.upsert_batch_iceberg``) remains the preferred
single-commit path where the runtime jar exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aisdb_spark.streaming import fsio

JOURNAL = "_txn.json"
BACKUP = "_txn_backup"


def last_applied_epoch(spark: SparkSession, tier_dir: str) -> int:
    doc = fsio.read_side_json(spark, tier_dir, "_epoch.json")
    try:
        return int(doc["last_epoch"]) if doc else -1
    except (KeyError, TypeError, ValueError):
        return -1


def pending_refresh_dates(spark: SparkSession, tier_dir: str) -> list:
    """Days whose coarser-tier refresh was recorded as owed but not yet
    completed (crash between the 1min epoch record and the 1h/1d refresh —
    round-4 ADVICE fix: without this marker a replayed epoch returned
    dates=[] and the coarser tiers stayed stale forever)."""
    import datetime as dt

    doc = fsio.read_side_json(spark, tier_dir, "_epoch.json") or {}
    try:
        return [dt.date.fromisoformat(d) for d in doc.get("pending_refresh", [])]
    except (TypeError, ValueError):
        return []


def record_epoch(
    spark: SparkSession, tier_dir: str, epoch_id: int,
    pending_refresh: list | None = None,
) -> None:
    """Atomically (tmp + rename) record the applied epoch beside the tier.
    ``pending_refresh`` marks days still owing a coarser-tier refresh; the
    cascade records them WITH the epoch and clears them (a second record
    with pending_refresh=None) only after the refresh completes — the
    refresh itself is idempotent (recomputed from the 1min tier), so a
    replay re-running it is safe."""
    payload: dict = {"last_epoch": epoch_id}
    if pending_refresh:
        payload["pending_refresh"] = [d.isoformat() for d in pending_refresh]
    fsio.write_side_json_atomic(spark, tier_dir, "_epoch.json", payload)


def recover(spark: SparkSession, tier_dir: str) -> bool:
    """Settle a crashed swap_commit, if any. Returns True when a rollback
    was performed (the journaled epoch had NOT been recorded — the batch
    must be replayed by the caller's source), False otherwise."""
    j = fsio.read_side_json(spark, tier_dir, JOURNAL)
    if not j:
        return False
    committed = (
        j.get("epoch") is not None
        and j["epoch"] <= last_applied_epoch(spark, tier_dir)
    )
    if not committed:
        backed = set(j.get("backed", []))
        for d in j.get("cleared", []):
            cur = f"{tier_dir}/bucket_date={d}"
            if d in backed:
                bak = f"{tier_dir}/{BACKUP}/bucket_date={d}"
                if fsio.exists(spark, bak):
                    fsio.delete_dir(spark, cur)  # partial-write debris
                    fsio.rename(spark, bak, cur)
                # backup absent → its rename never ran (or recovery already
                # restored it): cur IS the pre-image, leave it
            else:  # no pre-image existed: anything here is write debris
                fsio.delete_dir(spark, cur)
    fsio.delete_dir(spark, f"{tier_dir}/{JOURNAL}")
    fsio.delete_dir(spark, f"{tier_dir}/{BACKUP}")
    return not committed


def swap_commit(
    spark: SparkSession,
    tier_dir: str,
    out: DataFrame,
    dates,
    epoch_id: int | None = None,
    pending_refresh: list | None = None,
) -> None:
    """Steps 1-5 above. ``out`` must carry a ``bucket_date`` column whose
    values fall inside ``dates`` (every date the merge read or writes),
    and its plan must NOT read the tier lazily — callers that merged with
    existing tier rows localCheckpoint first (they already did, for
    dynamic-overwrite lineage), because step 2 renames those partitions
    away before the write."""
    dates = sorted({str(d) for d in dates})
    backed = [
        d for d in dates if fsio.exists(spark, f"{tier_dir}/bucket_date={d}")
    ]
    fsio.write_side_json_atomic(
        spark, tier_dir, JOURNAL,
        {"epoch": epoch_id, "backed": backed, "cleared": dates},
    )
    for d in backed:
        fsio.rename(
            spark,
            f"{tier_dir}/bucket_date={d}",
            f"{tier_dir}/{BACKUP}/bucket_date={d}",
        )
    (
        out.write.mode("overwrite")
        # write-scoped dynamic overwrite: only partitions present in `out`
        # are written; the session conf stays untouched (a session-level
        # set would silently change later static overwrites)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_date")
        .parquet(tier_dir)
    )
    if epoch_id is not None:
        record_epoch(spark, tier_dir, epoch_id, pending_refresh)
    fsio.delete_dir(spark, f"{tier_dir}/{JOURNAL}")
    fsio.delete_dir(spark, f"{tier_dir}/{BACKUP}")
