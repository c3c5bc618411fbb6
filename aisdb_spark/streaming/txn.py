"""Journaled partition-swap commit for tier upserts.

Closes the crash window rounds 1-4 documented between a tier's dynamic
partition overwrite finishing and the ``_epoch.json`` record landing
(``upsert.py`` module docstring: "closing that window needs a
transactional table format"). It doesn't, quite: the parquet path gets
the same effectively-once contract from a write-ahead journal, because
the epoch record itself is an atomic rename and can serve as the commit
point. The protocol, per micro-batch:

1. journal ``_txn.json`` ``{epoch, backed, cleared, files}`` (atomic
   rename; ``files`` is the per-partition pre-image file manifest);
2. rename every touched partition that exists into ``_txn_backup/``
   (metadata-only on local/HDFS; the ``_`` prefix hides both journal
   and backups from parquet scans and :func:`fsio.tier_nonempty`);
3. write the new partitions — every pre-image is renamed away, so the
   write lands in empty slots, and a touched partition with no output
   rows simply ceases to exist (emptied-partition cleanup is free,
   replacing the local-fs-only ``shutil.rmtree`` pass);
4. record the epoch in ``_epoch.json``  ← THE commit point;
5. rewrite the journal with ``state: committed`` (atomic), then delete
   the backups, then the journal — the flag means any later crash is
   arbitrated as "finish cleanup", never rollback, so a half-done
   cleanup can never strand a backup for the next swap's rename to
   collide with.

:func:`recover` (run at the top of every upsert) arbitrates any crash:
journal flagged committed, or its epoch already recorded → the commit
happened, finish step 5; otherwise it did not — delete write debris
and rename the backups home, restoring the exact pre-batch tier for
the checkpointed source's replay of the same epoch. Restoration is
file-granular against the journaled manifest: each pre-image file is
in the backup, at home, or both (an S3-style copy+delete rename can
crash mid-partition), so recovery converges from ANY interleaving and
re-running a crashed recovery re-arbitrates identically. With
``epoch_id=None`` (hand-driven callers outside a streaming checkpoint)
the committed flag itself is the commit point: a crash after the write
but before the flip rolls the batch back — at-most-once, documented.

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


def _restore_partition(spark: SparkSession, tier_dir: str, d: str,
                       manifest: list | None) -> None:
    """Put partition ``d`` back to its journaled pre-image (uncommitted
    crash). With a per-file ``manifest`` the restore is file-granular, so
    it survives a crash INSIDE the backup rename itself on stores where
    rename is copy+delete (S3A): each manifest file is in the backup, at
    home, or both (copied, delete pending) — backup wins (same bytes);
    anything at home that is NOT in the manifest is new-write debris."""
    cur = f"{tier_dir}/bucket_date={d}"
    bak = f"{tier_dir}/{BACKUP}/bucket_date={d}"
    if manifest is None:  # pre-manifest journal: directory-level arbitration
        if fsio.exists(spark, bak):
            fsio.delete_dir(spark, cur)  # partial-write debris
            fsio.rename(spark, bak, cur)
        # backup absent → its rename never ran: cur IS the pre-image
        return
    names = set(manifest)
    for n, _sz, is_dir in fsio.list_entries(spark, cur):
        if not is_dir and n not in names:
            fsio.delete_dir(spark, f"{cur}/{n}")  # write debris
    for n in manifest:
        if fsio.exists(spark, f"{bak}/{n}"):
            fsio.delete_dir(spark, f"{cur}/{n}")  # half-copied duplicate
            fsio.rename(spark, f"{bak}/{n}", f"{cur}/{n}")
        # else: file already home (never renamed away, or restored)


def recover(spark: SparkSession, tier_dir: str) -> bool:
    """Settle a crashed swap_commit, if any. Returns True when a rollback
    was performed (the journaled epoch had NOT been recorded — the batch
    must be replayed by the caller's source), False otherwise."""
    j = fsio.read_side_json(spark, tier_dir, JOURNAL)
    if not j:
        # no journal → the last swap fully arbitrated; a backup dir here
        # is settled garbage from a cleanup interrupted under the pre-r5
        # deletion order, and it would poison the next swap's rename
        fsio.delete_dir(spark, f"{tier_dir}/{BACKUP}")
        return False
    committed = j.get("state") == "committed" or (
        j.get("epoch") is not None
        and j["epoch"] <= last_applied_epoch(spark, tier_dir)
    )
    if not committed:
        backed = set(j.get("backed", []))
        files = j.get("files", {})
        for d in j.get("cleared", []):
            if d in backed:
                _restore_partition(spark, tier_dir, d, files.get(d))
            else:  # no pre-image existed: anything here is write debris
                fsio.delete_dir(spark, f"{tier_dir}/bucket_date={d}")
    fsio.delete_dir(spark, f"{tier_dir}/{BACKUP}")
    fsio.delete_side_json(spark, tier_dir, JOURNAL)
    return not committed


def swap_commit(
    spark: SparkSession,
    tier_dir: str,
    out: DataFrame,
    dates,
    epoch_id: int | None = None,
    pending_refresh: list | None = None,
    rows_hint: int | None = None,
) -> None:
    """Steps 1-5 above. ``out`` must carry a ``bucket_date`` column whose
    values fall inside ``dates`` (every date the merge read or writes),
    and its plan must NOT read the tier lazily — callers that merged with
    existing tier rows localCheckpoint first (they already did, for
    dynamic-overwrite lineage), because step 2 renames those partitions
    away before the write.

    ``rows_hint``: the caller's row count for the NEW side of the merge
    (callers get it for free from the same job that finds the touched
    dates). Together with the on-disk bytes of the backed-up partitions
    (already listed for the journal), it sizes the output file count."""
    dates = sorted({str(d) for d in dates})
    backed, files = [], {}
    backed_bytes = 0
    for d in dates:
        entries = fsio.list_entries(spark, f"{tier_dir}/bucket_date={d}")
        if entries:
            backed.append(d)
            # per-file pre-image manifest: lets recover() arbitrate a crash
            # INSIDE a copy+delete rename (S3A) file-by-file instead of
            # trusting backup-directory existence as a complete pre-image
            files[d] = sorted(n for n, _sz, is_dir in entries if not is_dir)
            backed_bytes += sum(sz for _n, sz, is_dir in entries if not is_dir)
    journal = {"epoch": epoch_id, "backed": backed, "cleared": dates,
               "files": files}
    fsio.write_side_json_atomic(spark, tier_dir, JOURNAL, journal)
    for d in backed:
        fsio.rename(
            spark,
            f"{tier_dir}/bucket_date={d}",
            f"{tier_dir}/{BACKUP}/bucket_date={d}",
        )
    # Re-cluster on (bucket_date, salt) before the partitioned write:
    # without this every shuffle partition writes a sliver into every date
    # directory — file count ∝ parallelism × dates (measured 1,920 files
    # per micro-batch at 32 partitions × 30 dates, 4-16 s to write and as
    # long again to read back). With it, file count is dates × k — the
    # same bucketed layout rule as checkpoint.write_tier. k is
    # SIZE-derived (guide §6), from three terms, floor 1:
    # - write parallelism: ~250k rows per write task, capped at 2×cores —
    #   a 10k-row micro-batch writes ONE file per date (commit cost ∝
    #   file count; a parallelism-only 2×cores rule wrote 3× the files),
    #   while a 20M-row merge keeps ~2×cores write tasks (a
    #   dates-only task count regressed that case 87→131 s at the 20M
    #   drain: ~30 tasks from 30 hash keys collide into stragglers,
    #   guide §2.5);
    # - file sizing: ~512 MB of pre-existing partition bytes, and ~1M
    #   rows, per file per date.
    # The salt is a deterministic row hash (task retries reproduce the
    # same placement). ``rows_hint`` should be the OUTPUT row count when
    # the caller has it cheaply (post-localCheckpoint count); callers
    # that cannot hint fall back to bytes-only sizing.
    from pyspark.sql import functions as F

    n_dates = max(len(dates), 1)
    rows = int(rows_hint or 0)
    desired_tasks = min(-(-rows // 250_000), 2 * spark.sparkContext.defaultParallelism)
    k = max(
        1,
        -(-desired_tasks // n_dates),
        -(-backed_bytes // (512 * 1024 * 1024 * n_dates)),
        -(-rows // (1_000_000 * n_dates)),
    )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in out.columns]), F.lit(k))
    out = out.repartition(n_dates * k, F.col("bucket_date"), salt)
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
    # flip the journal to committed BEFORE deleting backups: from here any
    # crash is arbitrated as "finish cleanup", never rollback — without
    # this flag a crash between the two deletes below left an orphaned
    # backup that the NEXT swap's rename collided with, and for
    # epoch_id=None there was no other committed signal at all
    fsio.write_side_json_atomic(
        spark, tier_dir, JOURNAL, {**journal, "state": "committed"}
    )
    fsio.delete_dir(spark, f"{tier_dir}/{BACKUP}")
    fsio.delete_side_json(spark, tier_dir, JOURNAL)
