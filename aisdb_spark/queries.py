"""Query registry: every implemented operator as a (spark, sf_dir) callable
plus its DuckDB oracle SQL.

Both sides build the identical transcripts table from the shared ``events``
view (``TRANSCRIPTS_CTE`` is portable SQL), so each oracle check verifies the
operator end-to-end. Aggregates are aliased identically on both sides (the
driver's compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aisdb_spark.operators import dedup, deltas, rollup, segmentation
from aisdb_spark.sources.transcripts import (
    TRANSCRIPTS_CTE,
    VALUE_EXPR,
    load_transcripts,
    with_value,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# DuckDB oracle prelude: transcripts + the canonical value series.
# ``tv`` = transcripts-with-value, mirroring sources.transcripts.with_value.
_PRELUDE = f"WITH {TRANSCRIPTS_CTE},\ntv AS (SELECT *, {VALUE_EXPR} AS value FROM transcripts)"


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → rows-only driver check."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_value(load_transcripts(spark, sf_dir))


_ROLLUP_MEASURES = """
    CAST(count(*) AS BIGINT) AS n_turns,
    CAST(sum(value) AS BIGINT) AS sum_value,
    min(value) AS min_value,
    max(value) AS max_value,
    min_by(value, turn_idx) AS first_value,
    max_by(value, turn_idx) AS last_value"""


@query(
    "rollup_1min",
    f"""{_PRELUDE}
SELECT conv_id, date_trunc('minute', ts) AS bucket_start,{_ROLLUP_MEASURES}
FROM tv GROUP BY 1, 2""",
)
def rollup_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw→1min retention tier (SURVEY.md §2.4 continuous-aggregate analog)."""
    return rollup.temporal_bin(_tv(spark, sf_dir), "minute")


@query(
    "rollup_1h",
    f"""{_PRELUDE}
SELECT conv_id, date_trunc('hour', ts) AS bucket_start,{_ROLLUP_MEASURES}
FROM tv GROUP BY 1, 2""",
)
def rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1min→1h cascade tier; oracle aggregates straight from raw — equality
    proves the cascade composes (first/last valid because ts is monotone in
    turn_idx within a conversation)."""
    return rollup.tier_from_finer(
        rollup.temporal_bin(_tv(spark, sf_dir), "minute"), "hour"
    )


@query(
    "rollup_1d",
    f"""{_PRELUDE}
SELECT conv_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,{_ROLLUP_MEASURES}
FROM tv GROUP BY 1, 2""",
)
def rollup_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cascade raw→1min→1h→1d vs direct-from-raw oracle."""
    t = rollup.rollup_cascade(_tv(spark, sf_dir))
    return t["1d"]


@query(
    "gap_segments",
    f"""{_PRELUDE},
flagged AS (
  SELECT conv_id, turn_idx, ts,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY conv_id ORDER BY turn_idx) >= 3600000000
    THEN 1 ELSE 0 END AS flag
  FROM tv
),
seg AS (
  SELECT conv_id, turn_idx, ts,
    CAST(sum(flag) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS UNBOUNDED PRECEDING) AS INTEGER) AS segment_id
  FROM flagged
)
SELECT conv_id, segment_id,
  min(turn_idx) AS start_turn_idx, max(turn_idx) AS end_turn_idx,
  min(ts) AS start_ts, max(ts) AS end_ts,
  CAST(count(*) AS BIGINT) AS n_turns
FROM seg GROUP BY 1, 2""",
)
def gap_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-aware segmentation (AISdb split_timedelta,
    aisdb/track_gen.py:167-204) collapsed to segment bounds."""
    return segmentation.segment_bounds(
        segmentation.gap_split(_tv(spark, sf_dir), gap_seconds=3600)
    )


@query(
    "dedup_turns",
    f"""{_PRELUDE},
doubled AS (SELECT * FROM transcripts UNION ALL SELECT * FROM transcripts),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx
    ORDER BY ts ASC, text ASC NULLS LAST, role ASC NULLS LAST) AS _rn
  FROM doubled
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM ranked WHERE _rn = 1""",
)
def dedup_turns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup (aisdb/database/dbconn.py:404-419 analog): the
    input is doubled with UNION ALL, dedup must restore exactly one row per
    (conv_id, turn_idx) — also proves per-turn text equality survives."""
    t = load_transcripts(spark, sf_dir)
    return dedup.dedup_turns(t.unionAll(t))


@query(
    "turn_deltas",
    f"""{_PRELUDE}
SELECT conv_id, turn_idx,
  epoch_us(ts) - lag(epoch_us(ts))
    OVER (PARTITION BY conv_id ORDER BY turn_idx) AS delta_us,
  value - lag(value) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS delta_value,
  CAST(value - lag(value) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS DOUBLE)
    / greatest(CAST(floor((epoch_us(ts) - lag(epoch_us(ts))
        OVER (PARTITION BY conv_id ORDER BY turn_idx)) / 1000000) AS DOUBLE), 1.0)
    AS rate
FROM tv""",
)
def turn_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise delta series (aisdb/gis.py:93-181 analog)."""
    return deltas.with_deltas(_tv(spark, sf_dir)).select(
        "conv_id", "turn_idx", "delta_us", "delta_value", "rate"
    )


@query(
    "time_filter",
    f"""{_PRELUDE}
SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
  AND conv_id IS NOT NULL""",
)
def time_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """in_timerange + valid-entity predicate (aisdb/database/
    sql_query_strings.py:56-69, :103-115). On a partitioned table this prunes
    partitions; .explain shows the pushed filter."""
    t = load_transcripts(spark, sf_dir)
    return t.filter(
        F.col("ts").between("2024-01-10 00:00:00", "2024-01-20 00:00:00")
        & F.col("conv_id").isNotNull()
    )
