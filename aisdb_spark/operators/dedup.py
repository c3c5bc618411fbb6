"""Turn-level deduplication with a deterministic winner.

AISdb dedups twice: at insert via ``ON CONFLICT DO NOTHING`` on the wide PK
(``aisdb/aisdb_sql/insert_dynamic_clusteredidx.sql:16``) and after the fact
with ``row_number() OVER (PARTITION BY mmsi, time, source ORDER BY ctid)``
deleting rank>1 (``aisdb/database/dbconn.py:404-419``). The graft keeps one
row per ``(conv_id, turn_idx)``, winner chosen by earliest ``ts`` then
smallest text (a total, content-based order — unlike ctid it is
deterministic across engines and partitionings, which the byte-match
invariant requires).

Scale: a single window on the entity key; Catalyst plans it as one hash
exchange shared with downstream per-conversation windows. Prefer this over
``dropDuplicates`` when the winner matters; ``dropDuplicates`` picks an
arbitrary row per key (first-seen per partition) which breaks determinism
across parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_turns(df: DataFrame) -> DataFrame:
    """Keep exactly one row per (conv_id, turn_idx), deterministically."""
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").asc(),
        F.col("text").asc_nulls_last(),
        F.col("role").asc_nulls_last(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
