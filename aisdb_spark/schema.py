"""Canonical schemas.

The transcripts table shape is fixed by the task's input hint:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)`` — the graft analog of AISdb's dynamic position table
(``aisdb/aisdb_sql/createtable_dynamic_clustered.sql:1-14``: mmsi→conv_id,
time→ts, with ``turn_idx`` as the stable in-conversation ordinal that AISdb
gets from its global ``ORDER BY 1,2``, ``aisdb/database/sqlfcn.py:58``).

The per-turn numeric series driving rollups/interpolation is
``value = length(text)`` cast to BIGINT: an *integer* domain so that every
tier's SUM is exact and order-independent — the foundation of the
byte-match-across-parallelism guarantee (float sums are order-sensitive;
see SURVEY.md §7 "Genuinely hard (a)").
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# conv_meta: per-conversation static attributes (broadcast-join side),
# analog of AISdb's static_{YYYYMM}_aggregate
# (aisdb/aisdb_sql/createtable_static_aggregate.sql:1-17).
CONV_META_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("channel", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("created_ts", T.TimestampType(), True),
    ]
)
