"""Transcripts source: canonical derivation + synthetic edge-case fixture.

The engine's primary input is an Iceberg/parquet table of multi-turn
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``. For tests and
benchmarks it is derived *deterministically* from the driver's ``events``
table with one portable SQL fragment (``TRANSCRIPTS_CTE``) that parses
identically in Spark SQL and DuckDB — so every downstream operator is
oracle-checkable row-for-row. This replaces AISdb's ingest/decode stage
(``aisdb_lib/src/decode.rs:179-193``): where AISdb parses NMEA into the
dynamic table, we map an event stream into turns.

Mapping (entity key and stable ordering mirror AISdb's
``(mmsi, time)`` composite ordering, ``aisdb/database/sqlfcn.py:58``):

- ``conv_id``  = ``'conv-' || user_id``            (mmsi analog)
- ``turn_idx`` = dense per-conversation ordinal from ``row_number() over
  (partition by user_id order by ts, event_id) - 1`` — deterministic because
  ``event_id`` is unique.
- ``role``     = event_type → {user, assistant, system, tool}
- ``text``     = ``event_type || ' ' || props``
- ``tool``     = ``'err_handler'`` for tool turns, else NULL
- ``ts``       = event time

Scale note: the derivation is a single window over ``user_id`` — one hash
shuffle on the entity key, the same partitioning every downstream per-
conversation operator needs, so Catalyst reuses the exchange. At 100 TB the
real table would be written once, Iceberg-partitioned ``days(ts)`` ×
``bucket(conv_id)``, and this CTE disappears.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aisdb_spark.schema import TRANSCRIPTS_SCHEMA
from aisdb_spark.sources.normalize import read_parquet

# Portable SQL (valid in both Spark SQL and DuckDB): the contract that makes
# the DuckDB oracle see the exact table Spark operators run on.
TRANSCRIPTS_CTE = """
transcripts AS (
  SELECT
    concat('conv-', user_id) AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
    CASE event_type
      WHEN 'purchase' THEN 'assistant'
      WHEN 'signup' THEN 'system'
      WHEN 'error' THEN 'tool'
      ELSE 'user'
    END AS role,
    concat(event_type, ' ', props) AS text,
    CASE WHEN event_type = 'error' THEN 'err_handler' END AS tool,
    ts
  FROM events
)
""".strip()

# The per-turn numeric series (SURVEY.md §7 domain mapping: AISdb's
# lon/lat/sog dynamic columns → a derived per-turn series). Integer domain so
# every SUM at every rollup tier is exact and order-independent — the
# byte-match-across-parallelism guarantee.
VALUE_EXPR = "CAST(length(text) AS BIGINT)"


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # read_parquet pins inferTimestampNTZ=false + UTC session tz so ``ts``
    # is TIMESTAMP_LTZ under ANY session, including the driver's vanilla one
    # (round-1 failure mode: unix_micros on TIMESTAMP_NTZ → AnalysisException).
    return read_parquet(spark, f"{sf_dir}/events.parquet")


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet → canonical transcripts DataFrame.

    Uses the same SQL text the DuckDB oracle runs, so both engines
    materialize identical rows.
    """
    load_events(spark, sf_dir).createOrReplaceTempView("events")
    return spark.sql(f"WITH {TRANSCRIPTS_CTE} SELECT * FROM transcripts")


def with_value(df: DataFrame) -> DataFrame:
    """Append the canonical numeric series column ``value`` (BIGINT)."""
    return df.withColumn("value", F.expr(VALUE_EXPR))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 40,
    seed: int = 42,
    base: dt.datetime = dt.datetime(2024, 1, 1, 0, 0, 0),
    gap_threshold_s: int = 3600,
) -> DataFrame:
    """Deterministic synthetic transcripts with every FIXTURES.md edge case.

    Mirrors the reference's tiny bundled fixtures strategy
    (``aisdb/tests/create_testing_data.py:11-22``): a seeded generator whose
    boundary rows are known by construction. Includes:

    - heavy-tailed conversation sizes with one hot conversation (~100x
      median) to exercise skew handling;
    - inter-turn gaps straddling ``gap_threshold_s`` so gap segmentation has
      known boundaries (AISdb split_timedelta, ``aisdb/track_gen.py:167-204``);
    - a single-turn conversation (interp must skip: ``aisdb/interp.py:98-100``);
    - duplicate ``(conv_id, turn_idx)`` rows and duplicate-ts rows
      (dedup precedent ``aisdb/database/dbconn.py:404-419``);
    - out-of-order on-disk arrival (order restored by ``turn_idx``);
    - a conversation spanning multiple days (monthly-UNION analog);
    - NULL/empty ``tool`` and ``text``.
    """
    rng = random.Random(seed)
    roles = ["user", "assistant", "system", "tool"]
    rows: list[tuple] = []

    def add_turn(conv: str, idx: int, t: dt.datetime, role: str | None = None,
                 text: str | None = "x", tool: str | None = None) -> None:
        role = role or roles[idx % len(roles)]
        if text == "x":
            text = f"{conv} turn {idx} " + "w" * (idx % 17)
        rows.append((conv, idx, role, text, tool, t))

    for c in range(n_convs):
        conv = f"syn-{c:03d}"
        if c == 0:
            # single-turn conversation
            add_turn(conv, 0, base)
            continue
        n_turns = 1 + int(rng.paretovariate(1.3) * 4)
        if c == 1:
            n_turns = 400  # hot conversation (~100x median)
        t = base + dt.timedelta(minutes=rng.randrange(0, 600))
        for i in range(min(n_turns, 500)):
            # mostly second/minute gaps; every ~25th turn a threshold-crossing gap
            if i > 0 and i % 25 == 0:
                t += dt.timedelta(seconds=gap_threshold_s + rng.randrange(60, 7200))
            elif i > 0:
                t += dt.timedelta(seconds=rng.randrange(1, 300))
            tool = "search" if i % 7 == 3 else None
            add_turn(conv, i, t, tool=tool)
        if c == 2:
            # duplicate (conv_id, turn_idx) and duplicate-ts rows
            rows.append((conv, 0, "user", "dup-row", None, rows[-1][5]))
            rows.append((conv, 1, "user", "dup-ts", None, rows[-1][5]))
        if c == 3:
            # NULL text / empty tool
            add_turn(conv, n_turns if n_turns < 500 else 500, t + dt.timedelta(seconds=5),
                     text=None, tool="")
        if c == 4:
            # spans multiple days
            add_turn(conv, 999, t + dt.timedelta(days=3), text="late day")

    rng.shuffle(rows)  # out-of-order arrival; operators must restore by turn_idx
    return spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
