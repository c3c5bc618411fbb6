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
from aisdb_spark.sources.normalize import read_parquet
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


# Prepared-plan reuse (guide §7.3: planning is single-threaded driver work
# and can dominate short queries). A registry builder is a PURE function of
# (session, sf_dir) → logical plan for most queries: re-invoking it re-runs
# ~10 DataFrame ops, each of which re-walks Catalyst analysis over the
# growing tree — measured 0.3-0.6 s of driver time per invocation at
# sf0.1, i.e. a third of many queries' wall time. Re-using the analyzed
# Dataset object skips exactly that re-analysis; EXECUTION is untouched —
# every action on the memoized frame re-runs the full scan→compute
# pipeline from the parquet inputs (nothing is persisted or .cache()d;
# this is prepared-statement caching, not result caching).
#
# Builders that are NOT pure plan constructors are excluded and rebuild on
# every call: the streaming drains and ingest/compaction rows perform real
# work (writes, stream drains) inside the builder, and the asof/ann rows
# collect driver-side scalars (time bounds, the query vector) whose
# freshness is part of the queries' contract.
_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_UNCACHEABLE = {
    "streaming_rollup_1min",
    "streaming_user_sessions",
    "late_upsert_1min",
    "streaming_ewma_03",
    "retention_compaction",
    "csv_ingest_roundtrip",
    "asof_signups_so_far",
    "asof_rate_lookup",
    "ann_brute_force_top10",
    "ann_lsh_top10",
    "ann_ivf_top10",
}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → rows-only driver check."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _UNCACHEABLE:
            QUERIES[name] = fn
        else:

            def cached(spark: SparkSession, sf_dir: str, _fn=fn, _name=name):
                key = (spark.sparkContext.applicationId, sf_dir, _name)
                df = _PLAN_CACHE.get(key)
                if df is None:
                    df = _fn(spark, sf_dir)
                    _PLAN_CACHE[key] = df
                return df

            QUERIES[name] = cached
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
    "salted_rollup_1min",
    f"""{_PRELUDE},
sk AS (
  SELECT CASE WHEN CAST(substr(conv_id, 6) AS INTEGER) % 7 = 0
              THEN 'hot-conv' ELSE conv_id END AS conv_id,
         conv_id AS orig, turn_idx AS oti, ts, value
  FROM tv),
rk AS (
  SELECT conv_id, ts, value,
    CAST(row_number() OVER (PARTITION BY conv_id ORDER BY ts, orig, oti) - 1
         AS INTEGER) AS turn_idx
  FROM sk)
SELECT 'uniform' AS variant, conv_id,
  date_trunc('minute', ts) AS bucket_start,{_ROLLUP_MEASURES}
FROM tv GROUP BY conv_id, date_trunc('minute', ts)
UNION ALL
SELECT 'skewed' AS variant, conv_id,
  date_trunc('minute', ts) AS bucket_start,{_ROLLUP_MEASURES}
FROM rk GROUP BY conv_id, date_trunc('minute', ts)""",
)
def salted_rollup_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe two-phase rollup (partial per (conv, bucket, salt) →
    merge) — the skew plan for conversations too hot for one reducer
    (plans/partitioning.with_salt; TimescaleDB mmsi-hash partitioning
    analog). Two variants in one driver row (registry folded to fit the
    50-query correctness budget, round 4):

    - ``uniform``: the natural corpus — salted ≡ direct, proven by the
      driver's value hash against the plain-aggregation oracle;
    - ``skewed``: ADVERSARIAL skew (round-2 verdict item 8) — every 7th
      conversation collapsed into one 'hot-conv' holding ~14% of all rows
      (FIXTURES.md's 100×-median hot conversation, pushed further), turns
      re-indexed by a deterministic total order (ts, original conv,
      original idx) so first/last stay well-defined. Equality under a key
      this hot is the skew-correctness proof the uniform corpus can't
      give. The plan shape (partial aggregate keyed on salt before the
      merge, AQE on) is pinned by tests/test_skew.py."""
    from pyspark.sql import Window

    tv = _tv(spark, sf_dir)
    uniform = rollup.temporal_bin_salted(tv, "minute").withColumn(
        "variant", F.lit("uniform")
    )
    hot = F.when(
        F.substring("conv_id", 6, 20).cast("int") % 7 == 0, F.lit("hot-conv")
    ).otherwise(F.col("conv_id"))
    sk = tv.withColumn("orig", F.col("conv_id")).withColumn("conv_id", hot)
    w = Window.partitionBy("conv_id").orderBy("ts", "orig", "turn_idx")
    rk = sk.withColumn(
        "turn_idx", (F.row_number().over(w) - 1).cast("int")
    ).select("conv_id", "turn_idx", "ts", "value")
    skewed = rollup.temporal_bin_salted(rk, "minute").withColumn(
        "variant", F.lit("skewed")
    )
    return uniform.unionByName(skewed)


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
    AS rate,
  least(abs(value - 30) % 60, 60 - (abs(value - 30) % 60)) AS circ_diff,
  ((value - (-180)) % 360 + 360) % 360 + (-180) AS wrapped,
  epoch_us(ts) // 1000000 AS epoch_sec,
  regexp_replace(text, '[,#"''\\n\\r]', ' ', 'g') AS sanitized
FROM tv""",
)
def turn_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise delta series (aisdb/gis.py:93-181 analog) PLUS the scalar
    function surface of SURVEY.md §2.7 — circular diff, modular wrap,
    epoch conversion (``aisdb/gis.py:43-90`` dt_2_epoch/shiftcoord
    analogs) and CSV sanitization (``aisdb/proc_util.py:14-31``) — folded
    into one driver row (round 4) so the registry fits the 50-query
    correctness budget; both surfaces stay hash-checked every round."""
    from aisdb_spark.functions import (
        circular_diff,
        epoch_s,
        sanitize_csv_text,
        wrap_mod,
    )

    return deltas.with_deltas(_tv(spark, sf_dir)).select(
        "conv_id",
        "turn_idx",
        "delta_us",
        "delta_value",
        "rate",
        circular_diff(F.col("value"), F.lit(30), 60).alias("circ_diff"),
        wrap_mod(F.col("value")).alias("wrapped"),
        epoch_s(F.col("ts")).alias("epoch_sec"),
        sanitize_csv_text(F.col("text")).alias("sanitized"),
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


# ---------------------------------------------------------------------------
# Milestone 2: transitions, mode aggregation, enrichment joins, dwell time,
# downsampling, top-k, and exact-integer join/agg queries on the TPC-H-ish
# driver tables.
# ---------------------------------------------------------------------------

from aisdb_spark.operators import (  # noqa: E402
    downsample,
    joins,
    mode_agg,
    timeinrange,
    transitions,
)

_RUNS_CTE = """
runs0 AS (
  SELECT conv_id, turn_idx, role, value, ts,
    CASE WHEN lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NULL THEN 1
         WHEN role IS DISTINCT FROM lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) THEN 1
         ELSE 0 END AS flag
  FROM tv
),
runs AS (
  SELECT *, CAST(sum(flag) OVER (PARTITION BY conv_id ORDER BY turn_idx
    ROWS UNBOUNDED PRECEDING) - 1 AS INTEGER) AS run_id
  FROM runs0
)"""


@query(
    "transition_edges",
    f"""{_PRELUDE},{_RUNS_CTE},
per_run AS (
  SELECT conv_id, run_id,
    min_by(role, turn_idx) AS src,
    CAST(count(*) AS BIGINT) AS n_turns,
    CAST(sum(value) AS BIGINT) AS sum_value,
    min(turn_idx) AS start_turn_idx, max(turn_idx) AS end_turn_idx,
    min(ts) AS start_ts, max(ts) AS end_ts
  FROM runs GROUP BY 1, 2
)
SELECT conv_id, run_id, src, n_turns, sum_value,
  start_turn_idx, end_turn_idx, start_ts, end_ts,
  lead(src) OVER (PARTITION BY conv_id ORDER BY run_id) AS dst,
  epoch_us(end_ts) - epoch_us(start_ts) AS elapsed_us
FROM per_run""",
)
def transition_edges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-transition edge table (aisdb/network_graph.py:213-251 analog)."""
    return transitions.transition_edges(_tv(spark, sf_dir), key="role")


_META_CTE = """
base AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns, min(ts) AS created_ts,
    CAST(sum(value) AS BIGINT) AS total_value
  FROM tv GROUP BY 1
),
rc AS (SELECT conv_id, role, count(*) AS c FROM tv WHERE role IS NOT NULL GROUP BY 1, 2),
rm AS (
  SELECT conv_id, role AS mode_role FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY c DESC, role ASC) AS rn FROM rc
  ) WHERE rn = 1
),
tc AS (SELECT conv_id, tool, count(*) AS c FROM tv WHERE tool IS NOT NULL GROUP BY 1, 2),
tm AS (
  SELECT conv_id, tool AS mode_tool FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY c DESC, tool ASC) AS rn FROM tc
  ) WHERE rn = 1
)"""


@query(
    "conv_meta",
    f"""{_PRELUDE},{_META_CTE}
SELECT base.conv_id, n_turns, created_ts, total_value, mode_role, mode_tool
FROM base LEFT JOIN rm USING (conv_id) LEFT JOIN tm USING (conv_id)""",
)
def conv_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation static aggregate with deterministic mode
    (aisdb/database/dbconn.py:110-197 analog, distributed)."""
    return mode_agg.conv_meta(_tv(spark, sf_dir)).select(
        "conv_id", "n_turns", "created_ts", "total_value", "mode_role", "mode_tool"
    )


@query(
    "enrich_join",
    f"""{_PRELUDE},{_META_CTE},
ref AS (SELECT * FROM (VALUES
  ('user','human'), ('assistant','model'),
  ('system','orchestrator'), ('tool','machine')) AS t(role_code, role_txt)),
meta AS (
  SELECT base.conv_id, n_turns, created_ts, mode_role
  FROM base LEFT JOIN rm USING (conv_id)
)
SELECT tv.conv_id, turn_idx, role, text, tool, ts, value,
  mode_role, meta.n_turns AS n_turns, created_ts, role_txt
FROM tv
LEFT JOIN meta ON tv.conv_id = meta.conv_id
LEFT JOIN ref ON meta.mode_role = ref.role_code""",
)
def enrich_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dynamic ⟕ static-aggregate ⟕ broadcast dim chain
    (aisdb/aisdb_sql/select_join_dynamic_static_clusteredidx.sql:1-31)."""
    return joins.enrich_transcripts(spark, _tv(spark, sf_dir))


@query(
    "time_in_range",
    f"""{_PRELUDE},
banded AS (SELECT conv_id, turn_idx, ts FROM tv WHERE value BETWEEN 14 AND 16),
flagged AS (
  SELECT conv_id, turn_idx, ts,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY conv_id ORDER BY turn_idx) > 60000000
    THEN 1 ELSE 0 END AS flag
  FROM banded
),
sess AS (
  SELECT conv_id, turn_idx, ts,
    sum(flag) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS UNBOUNDED PRECEDING) AS _sess
  FROM flagged
),
per_sess AS (
  SELECT conv_id, _sess, CAST(count(*) AS BIGINT) AS n,
    epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
  FROM sess GROUP BY 1, 2
)
SELECT conv_id, CAST(sum(n) AS BIGINT) AS n_points,
  CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(dur_us) AS BIGINT) AS total_us,
  CAST(floor(sum(dur_us) / 60000000) AS BIGINT) AS total_minutes
FROM per_sess GROUP BY 1""",
)
def time_in_range_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell time with value in [14,16], 60s sessionization
    (aisdb/network_graph.py:51-67 analog)."""
    return timeinrange.time_in_range(_tv(spark, sf_dir), 14, 16, 60)


@query(
    "downsample_every_5",
    f"""{_PRELUDE}
SELECT conv_id, turn_idx, role, text, tool, ts FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rk
  FROM transcripts
) WHERE (rk - 1) % 5 = 0""",
)
def downsample_every_5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-Nth decimation (VW decimation slot, src/lib.rs:432-440)."""
    return downsample.every_nth(load_transcripts(spark, sf_dir), 5).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


@query(
    "downsample_bucket_first",
    f"""{_PRELUDE}
SELECT conv_id, date_trunc('minute', ts) AS bucket_start,
  min(turn_idx) AS turn_idx, min_by(value, turn_idx) AS value
FROM tv GROUP BY 1, 2""",
)
def downsample_bucket_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid downsampling: first point per (conv, minute)."""
    return downsample.bucket_first(_tv(spark, sf_dir), "minute")


@query(
    "topk_turns",
    f"""{_PRELUDE}
SELECT conv_id, turn_idx, value FROM (
  SELECT conv_id, turn_idx, value,
    row_number() OVER (PARTITION BY conv_id ORDER BY value DESC, turn_idx ASC) AS rk
  FROM tv
) WHERE rk <= 3""",
)
def topk_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest turns per conversation (window top-k idiom)."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy(
        F.col("value").desc(), F.col("turn_idx").asc()
    )
    return (
        _tv(spark, sf_dir)
        .select("conv_id", "turn_idx", "value")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .drop("rk")
    )


@query(
    "multi_split_segments",
    f"""{_PRELUDE},
flagged AS (
  SELECT conv_id, turn_idx, ts, value,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY conv_id ORDER BY turn_idx) >= 3600000000 THEN 1
         WHEN abs(value - lag(value) OVER (PARTITION BY conv_id ORDER BY turn_idx)) >= 3 THEN 1
         ELSE 0 END AS flag
  FROM tv
),
seg AS (
  SELECT conv_id, turn_idx,
    CAST(sum(flag) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS UNBOUNDED PRECEDING) AS INTEGER) AS segment_id
  FROM flagged
),
sized AS (
  SELECT *, CAST(count(*) OVER (PARTITION BY conv_id, segment_id) AS INTEGER) AS segment_len
  FROM seg
)
SELECT conv_id, turn_idx, segment_id, segment_len FROM sized WHERE segment_len >= 2""",
)
def multi_split_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-criterion split + short-segment drop
    (aisdb/track_gen.py:207-263, aisdb/proc_util.py:160-163)."""
    from aisdb_spark.operators import segmentation

    return segmentation.multi_criteria_split(
        _tv(spark, sf_dir),
        gap_seconds=3600,
        max_value_jump=3,
        max_rate=None,
        min_segment_length=2,
    ).select("conv_id", "turn_idx", "segment_id", "segment_len")


@query(
    "min_rate_filter",
    f"""{_PRELUDE},
d AS (
  SELECT conv_id, turn_idx, value,
    CAST(value - lag(value) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS DOUBLE)
      / greatest(CAST(floor((epoch_us(ts) - lag(epoch_us(ts))
          OVER (PARTITION BY conv_id ORDER BY turn_idx)) / 1000000) AS DOUBLE), 1.0)
      AS rate
  FROM tv
),
d2 AS (
  SELECT *, coalesce(abs(rate),
    abs(lead(rate) OVER (PARTITION BY conv_id ORDER BY turn_idx))) AS eff
  FROM d
)
SELECT conv_id, turn_idx, value FROM d2 WHERE eff >= 0.05 OR eff IS NULL""",
)
def min_rate_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-rate filter (min_speed_filter, aisdb/track_gen.py:287-300)."""
    from aisdb_spark.operators import deltas as deltas_mod

    return deltas_mod.min_rate_filter(_tv(spark, sf_dir), 0.05).select(
        "conv_id", "turn_idx", "value"
    )


# --- exact-integer join/agg queries on the TPC-H-ish driver tables --------
# Monetary sums use integer cents (CAST(round(x*100) AS BIGINT)) so the
# aggregation is order-independent and bit-identical across engines — the
# same trick the engine uses for rollup byte-matching.

_Q1_MEASURES = """
  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
  CAST(count(*) AS BIGINT) AS count_order"""


@query(
    "pricing_summary",
    f"""SELECT l_returnflag, l_linestatus,{_Q1_MEASURES}
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan+agg with exact integer measures; Catalyst pushes
    the shipdate filter into the parquet scan."""
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""SELECT l_returnflag, l_linestatus,{_Q1_MEASURES}
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2"""
    )


@query(
    "orders_by_nation",
    """SELECT n_name,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1""",
)
def orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join: fact ⋈ customer ⋈ broadcast nation dim (the reference's
    dynamic⋈static⋈coarsetype chain shape on the driver tables)."""
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    cust = read_parquet(spark, f"{sf_dir}/customer.parquet")
    nation = read_parquet(spark, f"{sf_dir}/nation.parquet")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "total_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Milestone 3: gap-fill interpolation (applyInPandas), EWMA, spacing
# resample, LTTB. interp_time's oracle reproduces the two-point formula with
# identical IEEE op order via DuckDB ASOF joins — bit-equal doubles.
# ---------------------------------------------------------------------------

from aisdb_spark.operators import interp, segmentation as seg_mod  # noqa: E402

_SEG_CTE = """
sflag AS (
  SELECT conv_id, turn_idx, ts, value,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY conv_id ORDER BY turn_idx) >= 3600000000
    THEN 1 ELSE 0 END AS flag
  FROM tv
),
segd AS (
  SELECT conv_id, turn_idx, ts, value,
    CAST(sum(flag) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS UNBOUNDED PRECEDING) AS INTEGER) AS segment_id
  FROM sflag
)"""


@query(
    "interp_time_10min",
    f"""{_PRELUDE},{_SEG_CTE},
samples AS (
  SELECT conv_id, segment_id, epoch_us(ts) AS t, CAST(value AS DOUBLE) AS v
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, segment_id, ts ORDER BY turn_idx DESC) AS rn
    FROM segd
  ) WHERE rn = 1
),
bounds AS (
  SELECT conv_id, segment_id, min(t) AS t0, max(t) AS tn
  FROM samples GROUP BY 1, 2 HAVING count(*) > 1
),
grid AS (
  SELECT conv_id, segment_id, unnest(range(t0, tn + 600000000, 600000000)) AS gt
  FROM bounds
),
prevj AS (
  SELECT g.conv_id, g.segment_id, g.gt, s.t AS prev_t, s.v AS prev_v
  FROM grid g ASOF LEFT JOIN samples s
    ON g.conv_id = s.conv_id AND g.segment_id = s.segment_id AND g.gt >= s.t
),
bothj AS (
  SELECT p.conv_id, p.segment_id, p.gt, p.prev_t, p.prev_v, s2.t AS next_t, s2.v AS next_v
  FROM prevj p ASOF LEFT JOIN samples s2
    ON p.conv_id = s2.conv_id AND p.segment_id = s2.segment_id AND p.gt <= s2.t
)
SELECT conv_id, segment_id, make_timestamp(gt) AS ts,
  CASE WHEN next_t IS NULL OR next_t = prev_t THEN prev_v
       ELSE prev_v + (next_v - prev_v) * (gt - prev_t) / (next_t - prev_t)
  END AS value
FROM bothj""",
)
def interp_time_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap-fill onto a 10-minute regular grid per (conv, segment)
    (aisdb/interp.py:57-118 semantics incl. inclusive-end arange grid,
    len<=1 skip, boundary clamping). Pure-expression version — zero Python
    boundary, bit-equal to the numpy kernel (tests/test_interp.py)."""
    segd = seg_mod.gap_split(_tv(spark, sf_dir), gap_seconds=3600)
    return interp.interp_time_expr(segd, step_seconds=600)


def _ewma_oracle(alpha: float) -> str:
    """Bit-exact DuckDB oracle for pandas ``ewm(adjust=True).mean()``.

    Replays the pandas C loop op-for-op in a recursive CTE (one recursion
    step per turn rank, all conversations in lockstep): ow ← ow·w;
    avg ← (ow·avg + x)/(ow + 1) unless avg = x; ow ← ow + 1, with
    w embedded via repr so both engines use the identical double.
    """
    w = repr(1.0 - alpha)
    return f"""{_PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1)},
ew AS (
  SELECT conv_id, turn_idx, ts, value,
    CAST(value AS DOUBLE) AS ewma_value, CAST(1.0 AS DOUBLE) AS old_wt
  FROM tv WHERE turn_idx = 0
  UNION ALL
  SELECT t.conv_id, t.turn_idx, t.ts, t.value,
    CASE WHEN e.ewma_value = CAST(t.value AS DOUBLE) THEN e.ewma_value
         ELSE ((e.old_wt * {w}) * e.ewma_value + CAST(t.value AS DOUBLE))
              / ((e.old_wt * {w}) + 1.0) END,
    (e.old_wt * {w}) + 1.0
  FROM ew e JOIN tv t ON t.conv_id = e.conv_id AND t.turn_idx = e.turn_idx + 1
)
SELECT conv_id, turn_idx, ts, value, ewma_value FROM ew"""


@query("ewma_03", _ewma_oracle(0.3))
def ewma_03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothing per conversation (north-rule gap-fill variant).
    Oracle: recursive CTE replaying pandas' adjust=True recursion with
    identical IEEE op order — hash-exact doubles (see _ewma_oracle)."""
    return interp.ewma(_tv(spark, sf_dir), alpha=0.3)


@query(
    "interp_spacing_100",
    f"""{_PRELUDE},
cums AS (
  SELECT conv_id, turn_idx, value,
    sum(value) OVER (PARTITION BY conv_id ORDER BY turn_idx
      ROWS UNBOUNDED PRECEDING) AS _cum
  FROM tv
),
lagged AS (
  SELECT conv_id, turn_idx, value, _cum,
    lag(_cum) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS _prev
  FROM cums
)
SELECT conv_id, turn_idx, value FROM lagged
WHERE _prev IS NULL OR floor(_cum / 100) > floor(_prev / 100)""",
)
def interp_spacing_100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-value spacing resample (aisdb/interp.py:195-270 analog)."""
    return interp.interp_spacing(_tv(spark, sf_dir), spacing=100).select(
        "conv_id", "turn_idx", "value"
    )


def _lttb_oracle(n: int) -> str:
    """Exact DuckDB oracle for the integer-arithmetic LTTB kernel.

    The kernel's sequential bucket-argmax recursion (selected point of
    bucket i depends on bucket i-1's choice) is replayed as a recursive CTE
    stepping bucket-by-bucket, all conversations in lockstep. The argmax is
    an anti-join (NOT EXISTS a strictly-better candidate, ties → lowest
    turn_idx); every quantity is BIGINT, so equality is exact by
    construction — no float op-order concerns.
    """
    area = (
        "abs((nb.n * r.a_x - nb.cxs) * ({p}.y - r.a_y)"
        " - (r.a_x - {p}.x) * (nb.cys - nb.n * r.a_y))"
    )
    a_c, a_c2 = area.format(p="c"), area.format(p="c2")
    return f"""{_PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1)},
pts AS (
  SELECT conv_id, turn_idx, ts, value,
    CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS m,
    (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY conv_id)) // 1000 AS x,
    CAST(value AS BIGINT) AS y
  FROM tv
),
big AS (SELECT * FROM pts WHERE m > {n}),
bkt AS (
  SELECT conv_id, m, j,
    1 + (j * (m - 2)) // {n - 2} AS lo,
    CASE WHEN j = {n - 2} THEN m ELSE 1 + ((j + 1) * (m - 2)) // {n - 2} END AS hi
  FROM (SELECT DISTINCT conv_id, m FROM big), range({n - 1}) r(j)
),
bsum AS (
  SELECT b.conv_id, b.j, b.lo, b.hi,
    CAST(count(*) AS BIGINT) AS n, sum(p.x) AS cxs, sum(p.y) AS cys
  FROM bkt b JOIN big p ON p.conv_id = b.conv_id
    AND p.turn_idx >= b.lo AND p.turn_idx < b.hi
  GROUP BY 1, 2, 3, 4
),
rec AS (
  SELECT conv_id, -1 AS i, CAST(0 AS BIGINT) AS a_idx, x AS a_x, y AS a_y
  FROM big WHERE turn_idx = 0
  UNION ALL
  SELECT r.conv_id, r.i + 1, CAST(c.turn_idx AS BIGINT), c.x, c.y
  FROM rec r
  JOIN bkt cb ON cb.conv_id = r.conv_id AND cb.j = r.i + 1
  JOIN bsum nb ON nb.conv_id = r.conv_id AND nb.j = r.i + 2
  JOIN big c ON c.conv_id = r.conv_id
    AND c.turn_idx >= cb.lo AND c.turn_idx < cb.hi
  WHERE r.i + 1 <= {n - 3}
    AND NOT EXISTS (
      SELECT 1 FROM big c2
      WHERE c2.conv_id = r.conv_id AND c2.turn_idx >= cb.lo AND c2.turn_idx < cb.hi
        AND ({a_c2} > {a_c} OR ({a_c2} = {a_c} AND c2.turn_idx < c.turn_idx))
    )
),
keepers AS (
  SELECT conv_id, a_idx FROM rec
  UNION SELECT conv_id, m - 1 FROM (SELECT DISTINCT conv_id, m FROM big)
)
SELECT p.conv_id, p.turn_idx, p.ts, p.value
FROM big p JOIN keepers k ON p.conv_id = k.conv_id AND p.turn_idx = k.a_idx
UNION ALL
SELECT conv_id, turn_idx, ts, value FROM pts WHERE m <= {n}"""


@query("lttb_64", _lttb_oracle(64))
def lttb_64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets decimation to ≤64 points/conversation
    (VW-decimation slot, src/lib.rs:432-440). Integer-exact semantics;
    oracle replays the bucket recursion in a recursive CTE (_lttb_oracle)."""
    return downsample.lttb(_tv(spark, sf_dir), n_out=64)


def _vw_oracle(th: int) -> str:
    """Exact DuckDB oracle for integer Visvalingam-Whyatt: a recursive CTE
    carries each conversation's surviving points as a LIST<STRUCT(i,x,y)>
    and removes ONE point per step — the minimum doubled-area interior
    point, first (=lowest-index) occurrence on ties — until the minimum
    reaches the threshold. Independent recomputation of the greedy
    machine; recursion depth = max removals per conversation."""
    return f"""{_PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1)},
pts0 AS (
  SELECT conv_id,
    list({{'i': turn_idx, 'x': x, 'y': y}} ORDER BY turn_idx) AS pts
  FROM (
    SELECT conv_id, turn_idx,
      (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY conv_id)) // 1000 AS x,
      CAST(value AS BIGINT) AS y
    FROM tv)
  GROUP BY conv_id
),
rec AS (
  SELECT conv_id, pts, false AS done FROM pts0
  UNION ALL
  SELECT conv_id,
    CASE WHEN stop THEN pts
         ELSE pts[1:p-1] || pts[p+1:len(pts)] END AS pts,
    stop AS done
  FROM (
    SELECT conv_id, pts,
      (mn IS NULL OR mn >= {th}) AS stop,
      list_position(areas, mn) + 1 AS p
    FROM (
      SELECT conv_id, pts, areas, list_min(areas) AS mn
      FROM (
        SELECT conv_id, pts,
          list_transform(generate_series(2, len(pts) - 1), k ->
            abs((pts[k].x - pts[k-1].x) * (pts[k+1].y - pts[k-1].y)
              - (pts[k+1].x - pts[k-1].x) * (pts[k].y - pts[k-1].y))) AS areas
        FROM rec WHERE NOT done)))
)
SELECT t.conv_id, t.turn_idx, t.ts, t.value
FROM tv t
JOIN (SELECT conv_id, unnest(list_transform(pts, q -> q.i)) AS turn_idx
      FROM rec WHERE done) k
  ON t.conv_id = k.conv_id AND t.turn_idx = k.turn_idx"""


@query("vw_decimate", _vw_oracle(100_000_000))
def vw_decimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Visvalingam-Whyatt effective-area decimation per conversation
    (``src/lib.rs:432-440`` ``simplify_linestring_idx``, applied at track
    build ``aisdb/track_gen.py:67-77``) — closes round 2's last cite-level
    parity gap beside the LTTB/every_nth/bucket_first slot. Integer
    doubled-area semantics; threshold keeps ~half the corpus. Oracle: the
    greedy elimination machine replayed in DuckDB over LIST<STRUCT> state
    (_vw_oracle)."""
    return downsample.vw_decimate(_tv(spark, sf_dir), min_area2=100_000_000)


# ---------------------------------------------------------------------------
# Milestone 4: Gorilla codec round-trip + per-entity compression metrics.
# The round-trip oracle is the identity query — decode(encode(series)) must
# reproduce (conv_id, ts, value) exactly, so the oracle is a plain SELECT.
# ---------------------------------------------------------------------------

from aisdb_spark.operators import codec, codec_arrow  # noqa: E402


@query(
    "gorilla_roundtrip",
    f"""{_PRELUDE}
SELECT 'arrow' AS variant, conv_id, ts, CAST(value AS DOUBLE) AS value FROM tv
UNION ALL
SELECT 'chunked' AS variant, conv_id, ts, CAST(value AS DOUBLE) AS value FROM tv""",
)
def gorilla_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla delta-of-delta + XOR encode → decode identity
    (codec spec: Pelkonen et al. VLDB'15; layout precedent
    aisdb/aisdb_sql/timescale_createtable_dynamic.sql:24-29). Two codec
    routes in one driver row (registry folded round 4):

    - ``arrow``: Arrow-native encode (``mapInArrow``,
      codec_arrow ``_encode_batches``) → Arrow-native decode
      (``decode_enc_batches_arrow``) — the registry-default decode path
      (round-3 verdict item 4; byte-identical to the pandas path per
      tests/test_codec.py, skips Arrow→pandas→Arrow);
    - ``chunked``: group-size-capped blobs (max_rows=40 forces multi-chunk
      conversations; AISdb's 50k batching precedent,
      aisdb_lib/src/decode.rs:19) → chunk-concatenating decode.

    Round 6: each variant's encode→decode runs FUSED in one Python stage
    (``roundtrip_partitions_arrow`` / ``roundtrip_conversations_chunked``)
    — same kernels, same blobs, identical rows, but the encoded bytes no
    longer cross the JVM↔Python boundary twice per variant (guide §4)."""
    tv = _tv(spark, sf_dir)
    whole = codec_arrow.roundtrip_partitions_arrow(tv).withColumn(
        "variant", F.lit("arrow")
    )
    chunked = codec.roundtrip_conversations_chunked(tv, max_rows=40).withColumn(
        "variant", F.lit("chunked")
    )
    return whole.unionByName(chunked)


# The metrics oracle re-derives the codec's EXACT compressed byte size in
# pure SQL: ts stream = 24-byte header + delta-of-delta class bits
# (0/10+16/110+32/1110+64 — costs 1/18/35/68); value stream = 16-byte header
# + Gorilla XOR bits, where the STRICT window-reuse policy (reuse iff the
# element's own (lead, mlen) equals the previous nonzero's — codec.py
# encode_vals) makes the stateful window machine a lag-over-nonzeros, no
# recursion needed. Float64 bit patterns of the integer-valued series are
# computed arithmetically ((1023+e)<<52 | mantissa); leading/trailing zero
# counts via bin() string trims. Each stream pads to a byte boundary
# (np.packbits), hence the (bits+7)//8.
# PRECONDITION (guarded, fails loudly): the float64 bit-pattern arithmetic
# below assumes 0 <= vi < 2^53 (exponent from the leading-1 position, no
# sign bit, exact-integer mantissa). VALUE_EXPR satisfies this today; if it
# ever produces a negative or >= 2^53 value the error() below aborts the
# oracle instead of silently hash-mismatching.
_GORILLA_SIZE_ORACLE = f"""{_PRELUDE},
ord_pts AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS tus,
    CASE WHEN CAST(value AS BIGINT) < 0
           OR CAST(value AS BIGINT) >= (1::BIGINT << 53)
         THEN CAST(error('gorilla size oracle precondition: value outside [0, 2^53)') AS BIGINT)
         ELSE CAST(value AS BIGINT) END AS vi
  FROM tv
),
fb AS (
  SELECT conv_id, turn_idx, tus,
    CASE WHEN vi = 0 THEN 0
         ELSE ((1023::BIGINT + e) << 52) | ((vi << (52 - e)) & ((1::BIGINT << 52) - 1))
    END AS bits
  FROM (SELECT *, CASE WHEN vi = 0 THEN 0
                       ELSE length(ltrim(bin(vi), '0')) - 1 END AS e FROM ord_pts)
),
xr AS (
  SELECT conv_id,
    row_number() OVER w - 1 AS idx,
    xor(bits, lag(bits) OVER w) AS x,
    (tus - lag(tus) OVER w) - (lag(tus) OVER w - lag(tus, 2) OVER w) AS dod
  FROM fb WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
costed AS (
  SELECT conv_id,
    CASE WHEN idx < 2 THEN 0
         WHEN zz = 0 THEN 1
         WHEN zz < 65536 THEN 18
         WHEN zz < 4294967296 THEN 35
         ELSE 68 END AS ts_bits,
    CASE WHEN idx < 1 THEN 0
         WHEN x = 0 THEN 1
         WHEN pw IS NOT NULL AND pw = li * 65 + mlen THEN 2 + mlen
         ELSE 13 + mlen END AS val_bits
  FROM (
    SELECT *,
      last_value(CASE WHEN idx >= 1 AND x <> 0 THEN li * 65 + mlen END IGNORE NULLS)
        OVER (PARTITION BY conv_id ORDER BY idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pw
    FROM (
      SELECT *, least(lz, 31) AS li, 64 - least(lz, 31) - tz AS mlen
      FROM (
        SELECT conv_id, idx, x,
          CASE WHEN dod >= 0 THEN 2 * dod ELSE -2 * dod - 1 END AS zz,
          64 - length(ltrim(bin(x), '0')) AS lz,
          CASE WHEN x = 0 THEN 64
               ELSE length(ltrim(bin(x), '0'))
                    - length(rtrim(ltrim(bin(x), '0'), '0')) END AS tz
        FROM xr
      )
    )
  )
)
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_points,
  CAST(16 * count(*) AS BIGINT) AS raw_bytes,
  CAST(24 + CASE WHEN count(*) <= 2 THEN 0 ELSE (sum(ts_bits) + 7) // 8 END
     + 16 + CASE WHEN count(*) <= 1 THEN 0 ELSE (sum(val_bits) + 7) // 8 END
     AS BIGINT) AS enc_bytes,
  CAST(16 * count(*) AS DOUBLE)
    / (24 + CASE WHEN count(*) <= 2 THEN 0 ELSE (sum(ts_bits) + 7) // 8 END
     + 16 + CASE WHEN count(*) <= 1 THEN 0 ELSE (sum(val_bits) + 7) // 8 END)
    AS ratio
FROM costed GROUP BY conv_id"""


@query("gorilla_metrics", _GORILLA_SIZE_ORACLE)
def gorilla_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation compression lineage: points, raw vs encoded bytes,
    ratio (the decode-rate metrics analog, aisdb_lib/src/decode.rs:228-257).
    The oracle recomputes the codec's exact wire size bit-by-bit in DuckDB
    SQL (_GORILLA_SIZE_ORACLE), so enc_bytes is hash-checked, not trusted."""
    enc = codec_arrow.compress_partitions_arrow(_tv(spark, sf_dir))
    return enc.select(
        "conv_id",
        "n_points",
        "raw_bytes",
        "enc_bytes",
        (F.col("raw_bytes").cast("double") / F.col("enc_bytes")).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# Milestone 5: as-of joins (weather/raster nearest-lookup analogs).
# ---------------------------------------------------------------------------

from aisdb_spark.operators import asof  # noqa: E402
from aisdb_spark.sources.transcripts import load_events  # noqa: E402


@query(
    "asof_last_tool",
    f"""{_PRELUDE},
probe AS (SELECT conv_id, turn_idx, ts FROM tv WHERE role = 'user'),
ref AS (
  SELECT conv_id, ts AS rts, CAST(max(value) AS DOUBLE) AS ref_value
  FROM tv WHERE role = 'tool' GROUP BY 1, 2
)
SELECT p.conv_id, p.turn_idx, p.ts, r.rts AS ref_ts, r.ref_value
FROM probe p ASOF LEFT JOIN ref r
  ON p.conv_id = r.conv_id AND p.ts >= r.rts""",
)
def asof_last_tool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user turn: the most recent tool turn's value at or before it —
    keyed backward as-of join via the union-window idiom (the scalable
    re-expression of AISdb's nearest weather lookup,
    aisdb/weather/data_store.py:160-168)."""
    tv = _tv(spark, sf_dir)
    probe = tv.filter(F.col("role") == "user").select("conv_id", "turn_idx", "ts")
    ref = (
        tv.filter(F.col("role") == "tool")
        .groupBy("conv_id", "ts")
        .agg(F.max("value").cast("double").alias("ref_value"))
    )
    return asof.asof_join_keyed(probe, ref, key="conv_id", value_cols=("ref_value",))


@query(
    "asof_signups_so_far",
    f"""{_PRELUDE},
sign AS (
  SELECT ts AS rts,
    row_number() OVER (ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'signup'
),
uniq AS (SELECT rts, CAST(max(rn) AS DOUBLE) AS ref_value FROM sign GROUP BY 1)
SELECT t.conv_id, t.turn_idx, t.ts, r.ref_value AS signups_so_far
FROM transcripts t ASOF LEFT JOIN uniq r ON t.ts >= r.rts""",
)
def asof_signups_so_far(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-keyed as-of: cumulative signup count at or before each turn.

    Signups scale with the fact table (a constant fraction of events), so
    the round-1 collect-and-broadcast was a driver OOM at 100 TB. Now a
    distributed bucketed prefix-sum (operators/asof.asof_cumulative_count):
    only O(parallelism) offsets are broadcast. The genuinely dim-sized
    broadcast-searchsorted path (raster analog, src/lib.rs:514-539) remains
    asof.asof_lookup_broadcast, pytest-covered."""
    ev = load_events(spark, sf_dir)
    sign = ev.filter(F.col("event_type") == "signup").select("ts")
    t = load_transcripts(spark, sf_dir)
    return asof.asof_cumulative_count(
        spark,
        t.select("conv_id", "turn_idx", "ts"),
        sign,
        out_col="signups_so_far",
    )


@query(
    "asof_rate_lookup",
    f"""{_PRELUDE},
bounds AS (
  SELECT (epoch_us(min(ts)) // 3600000000) * 3600000000 + 3600000000 AS start_us,
         epoch_us(max(ts)) AS hi_us
  FROM tv),
ks AS (
  -- series bound derived from the actual corpus span, exactly like the
  -- Spark side's np.arange((hi-start)//hour + 1) — no fixed cap that a
  -- long corpus could silently outgrow (round-4 ADVICE fix)
  SELECT unnest(generate_series(0::BIGINT, (hi_us - start_us) // 3600000000)) AS k,
         start_us
  FROM bounds),
sched AS (
  SELECT make_timestamp(start_us + k * 3600000000) AS rts,
         CAST((k * 37) % 100 + 1 AS DOUBLE) AS rate
  FROM ks)
SELECT conv_id, turn_idx, ts, rate
FROM tv ASOF LEFT JOIN sched ON tv.ts >= sched.rts""",
)
def asof_rate_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-sized as-of lookup — the raster-table analog
    (``aisdb/webdata/load_raster.py:27-79``; ``src/lib.rs:514-539``
    ``binarysearch_vector``): an hourly rate schedule (one row per hour of
    the corpus span — genuinely dim-sized, unlike signups) is broadcast as
    sorted arrays and every turn resolves its prevailing rate via
    vectorized ``np.searchsorted`` (operators/asof.asof_lookup_broadcast).
    The schedule starts one hour AFTER floor(min ts) so the earliest turns
    exercise the no-reference NULL path. Oracle: DuckDB ``ASOF LEFT JOIN``
    against the same generated schedule."""
    import numpy as np

    tv = _tv(spark, sf_dir)
    b = tv.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).first()  # two scalars — bounded driver transfer
    hour_us = 3_600_000_000
    start = (b["lo"] // hour_us) * hour_us + hour_us
    k = np.arange((b["hi"] - start) // hour_us + 1, dtype=np.int64)
    return asof.asof_lookup_broadcast(
        spark,
        tv.select("conv_id", "turn_idx", "ts"),
        start + k * hour_us,
        (k * 37) % 100 + 1.0,
        out_col="rate",
    )


# ---------------------------------------------------------------------------
# Milestone 6: training-data pipeline ops over documents — text analysis,
# exact dedup, MinHash-LSH / SimHash / n-gram-Jaccard near-dup. Oracles are
# generated from the same dialect templates (shared md5-derived hashes and
# permutation constants), so signatures are bit-identical across engines.
# ---------------------------------------------------------------------------

from aisdb_spark import textops  # noqa: E402


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_parquet(spark, f"{sf_dir}/documents.parquet")
    d.createOrReplaceTempView("documents")
    return d


@query(
    "text_analysis",
    f"SELECT {textops.text_analysis_select(True)}\nFROM documents",
)
def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic, token counting, quality scoring, content
    fingerprint — all list expressions, no UDFs."""
    _docs(spark, sf_dir)
    return spark.sql(f"SELECT {textops.text_analysis_select(False)}\nFROM documents")


@query(
    "exact_dedup",
    """WITH doubled AS (
  SELECT * FROM documents UNION ALL SELECT * FROM documents
)
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, md5(text) AS h,
  CAST(count(*) AS BIGINT) AS n_copies
FROM doubled GROUP BY md5(text)""",
)
def exact_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash on a doubled corpus (each doc must
    collapse to one row with n_copies=2)."""
    d = _docs(spark, sf_dir)
    return textops.exact_dedup(d.unionAll(d))


def _minhash_oracle() -> str:
    sigs = textops.minhash_from_hashes(True, "hs")
    sig_cols = ",\n    ".join(f"{e} AS mh{i}" for i, e in enumerate(sigs))
    band_selects = []
    for b in range(textops.LSH_BANDS):
        cols = ", ".join(
            f"mh{b * textops.LSH_ROWS + r}" for r in range(textops.LSH_ROWS)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, concat_ws('_', {cols}) AS bkey "
            f"FROM mh WHERE mh0 IS NOT NULL"
        )
    bands_sql = "\nUNION ALL\n".join(band_selects)
    sh = textops.dialect(True)["shingles"].format(t="t")
    hs = textops.shingle_hash_expr(True, "t")
    return f"""WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
),
hashed AS (SELECT doc_id, t, {hs} AS hs FROM toks),
mh AS (
  SELECT doc_id,
    {sig_cols}
  FROM hashed
),
bands AS (
{bands_sql}
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, list_distinct({sh}) AS s FROM toks)
SELECT doc1, doc2,
  round(CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
        / len(list_distinct(list_concat(s1.s, s2.s))), 6) AS jaccard
FROM cand
JOIN sh s1 ON cand.doc1 = s1.doc_id
JOIN sh s2 ON cand.doc2 = s2.doc_id
WHERE CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
      / len(list_distinct(list_concat(s1.s, s2.s))) >= 0.5"""


@query("minhash_lsh_pairs", None)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8 perms) + LSH(4 bands × 2) candidate pairs, Jaccard-verified
    ≥ 0.5 — shingle→minhash→band→bucket-join, all built-ins."""
    return textops.lsh_candidate_pairs(_docs(spark, sf_dir))


ORACLES["minhash_lsh_pairs"] = _minhash_oracle()


def _simhash_oracle() -> str:
    d = textops.dialect(True)
    toks = d["tokens"].format(t="text")
    h60 = d["H60"].format(s="t")
    hv = d["lmap"].format(l=toks, lam=f"t -> {h60}")
    sim = textops.simhash_from_hashes(True, "hv")
    bands = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {i} AS band, "
        f"{textops.simhash_band_key('simhash', b1, b2)} AS bkey FROM sh"
        for i, (b1, b2) in enumerate(textops.SIMHASH_BAND_PAIRS)
    )
    return f"""WITH hv_t AS (SELECT doc_id, {hv} AS hv FROM documents),
sh AS (SELECT doc_id, {sim} AS simhash FROM hv_t),
bands AS (
{bands}
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2,
    bit_count(xor(l.simhash::UBIGINT, r.simhash::UBIGINT)) AS hamming
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
)
SELECT doc1, doc2, CAST(hamming AS INTEGER) AS hamming FROM cand WHERE hamming <= 3"""


@query("simhash_near_pairs", None)
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-60 near-dup pairs: Manku block-pair banding (10 bands ×
    24-bit keys), full recall for hamming ≤ 3 by pigeonhole — the
    scale-bounded replacement for round-1's 8-bit bands."""
    return textops.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=3).select(
        "doc1", "doc2", F.col("hamming").cast("int").alias("hamming")
    )


ORACLES["simhash_near_pairs"] = _simhash_oracle()


def _ngram_oracle() -> str:
    d = textops.dialect(True)
    sh = d["shingles"].format(t="t")
    hs = textops.shingle_hash_expr(True, "t")
    sigs = textops.minhash_from_hashes(True, "hs")
    sig_cols = ",\n    ".join(f"{e} AS mh{i}" for i, e in enumerate(sigs))
    bands_sql = "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS band, mh{i} AS bkey FROM mh WHERE mh0 IS NOT NULL"
        for i in range(len(textops.MINHASH_COEFFS))
    )
    return f"""WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
),
hashed AS (SELECT doc_id, t, {hs} AS hs FROM toks),
mh AS (
  SELECT doc_id,
    {sig_cols}
  FROM hashed
),
bands AS (
{bands_sql}
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
),
sh AS (SELECT doc_id, list_distinct({sh}) AS s FROM toks)
SELECT doc1, doc2,
  round(CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
        / len(list_distinct(list_concat(s1.s, s2.s))), 6) AS jaccard
FROM cand
JOIN sh s1 ON cand.doc1 = s1.doc_id
JOIN sh s2 ON cand.doc2 = s2.doc_id
WHERE CAST(len(list_intersect(s1.s, s2.s)) AS DOUBLE)
      / len(list_distinct(list_concat(s1.s, s2.s))) >= 0.4"""


@query("ngram_jaccard_pairs", None)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup blocked on single-minhash LSH bands (8 bands
    × 1 row; 2³¹-cardinality keys — bounded candidate sets at any corpus
    size, recall 1-(1-J)^8)."""
    return textops.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.4)


ORACLES["ngram_jaccard_pairs"] = _ngram_oracle()


# ---------------------------------------------------------------------------
# Milestone 6b: embedding similarity — brute-force cosine top-k (oracle),
# LSH-bucketed ANN (rows-only), cosine near-dup pairs (oracle).
# ---------------------------------------------------------------------------

from aisdb_spark import similarity  # noqa: E402


def _bf_sql(duck: bool) -> str:
    cos = similarity.cosine_expr("embedding", "qe", duck)
    return f"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label, {cos} AS cos
FROM embeddings CROSS JOIN q
WHERE vec_id != 0
ORDER BY cos DESC, vec_id ASC LIMIT 10"""


@query("ann_brute_force_top10", _bf_sql(duck=True))
def ann_brute_force_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs the vec_id=0 query vector — explicit
    left-fold dot products (bit-equal across engines); physical plan is a
    scan + TakeOrderedAndProject (no global sort)."""
    similarity.load_embeddings(spark, sf_dir)
    return spark.sql(_bf_sql(duck=False))


def _ann_lsh_oracle() -> str:
    """DuckDB twin of the sign-bucket multi-probe ANN: same literal planes,
    same fold dot products; the query bucket and its Hamming-1 neighbors
    are computed in SQL."""
    import numpy as np

    planes = similarity.hyperplanes(64, 4)
    terms = []
    for j, p in enumerate(planes):
        dot = similarity._dot_expr(
            "{col}", similarity._vec_literal(p, duck=True), duck=True
        )
        terms.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << j} ELSE 0 END)")
    bucket = "(" + " + ".join(terms) + ")"
    cos = similarity.cosine_expr("e.embedding", "qe", duck=True)
    probe = " OR ".join(
        ["e.bucket = qb.b"] + [f"e.bucket = xor(qb.b, {1 << j})" for j in range(4)]
    )
    return f"""WITH base AS (
  SELECT vec_id, label, embedding,
    {bucket.replace('{col}', 'embedding')} AS bucket
  FROM embeddings
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
qb AS (SELECT {bucket.replace('{col}', 'qe')} AS b FROM q)
SELECT e.vec_id, e.label, {cos} AS cos
FROM base e CROSS JOIN q CROSS JOIN qb
WHERE e.vec_id != 0 AND ({probe})
ORDER BY cos DESC, e.vec_id ASC LIMIT 10"""


@query("ann_lsh_top10", None)
def ann_lsh_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH sign-bucket ANN with Hamming-1 multi-probe (the scale path —
    bucket pruning replaces the full scan)."""
    q = similarity.query_vector(spark, sf_dir, vec_id=0)
    return similarity.ann_topk(spark, sf_dir, q, k=10, n_planes=4)


ORACLES["ann_lsh_top10"] = _ann_lsh_oracle()


@query("ann_ivf_top10", similarity.ivf_topk_oracle())
def ann_ivf_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN (the brief's second scale path beside LSH): coarse
    quantizer = 16 deterministic md5-selected seed vectors; assignment and
    probe selection run in integer-quantized space (floor(x·2²⁰) — exact
    int64 distances, bit-stable across engines and partition orders);
    nprobe=4 lists exact-cosine reranked. The oracle recomputes seeds,
    assignment, probes, and rerank wholly in DuckDB SQL."""
    q = similarity.query_vector(spark, sf_dir, vec_id=0)
    return similarity.ivf_topk(spark, sf_dir, q, k=10)


@query("cosine_near_pairs", similarity.cosine_near_pairs_oracle(0.45))
def cosine_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via banded hyperplane-LSH blocking
    (b bands x r planes; label blocking was the round-1 scale-killer).
    Threshold 0.45 because the synthetic embeddings top out at cos~0.51 —
    at 0.95 the verify stage would never be exercised (0 rows both ways).
    ``r`` is pinned explicitly for oracle parity (the DuckDB twin embeds
    the same fixed planes); production callers omitting ``r`` get the
    corpus-self-sized band width (similarity.neardup_r_for)."""
    return similarity.cosine_near_pairs(
        spark, sf_dir, threshold=0.45, r=similarity.NEARDUP_R
    )


# ---------------------------------------------------------------------------
# Milestone 7: denoising encoder, discontinuity split, cubic spline,
# canonical pipeline.
# ---------------------------------------------------------------------------

from aisdb_spark.operators import encoder  # noqa: E402


def _pathways_oracle(
    max_jump: float = 4.0, max_rate: float = 0.001, minscore: float = 1e-6
) -> str:
    """DuckDB re-implementation of the greedy denoising encoder: a recursive
    CTE walks each conversation's segments in order, carrying the pathway
    end-points as a LIST<STRUCT(t,v)> state column; the score/argmax (last
    max wins, src/lib.rs:16-21) is a list_transform + list_reverse position.
    Independent recomputation of the full stateful machine, not an export."""
    return f"""{_PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1)},
base AS (
  SELECT conv_id, turn_idx, ts, epoch_us(ts) AS t_us,
    CAST(value AS DOUBLE) AS dv, CAST(value AS BIGINT) AS value,
    CASE WHEN lag(value) OVER w IS NULL THEN 0
         WHEN abs(value - lag(value) OVER w) >= {max_jump}
           OR abs(value - lag(value) OVER w)
              / greatest((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6, 1e-6)
              >= {max_rate}
         THEN 1 ELSE 0 END AS brk
  FROM tv
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
segrows AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx
    ROWS UNBOUNDED PRECEDING) AS INT) AS seg
  FROM base
),
segs AS (
  SELECT conv_id, seg,
    first(dv ORDER BY turn_idx) AS sv, first(t_us ORDER BY turn_idx) AS st,
    last(dv ORDER BY turn_idx) AS ev, last(t_us ORDER BY turn_idx) AS et
  FROM segrows GROUP BY conv_id, seg
),
rec AS (
  SELECT conv_id, seg, CAST(0 AS BIGINT) AS assigned,
    [{{'t': et, 'v': ev}}] AS paths
  FROM segs WHERE seg = 0
  UNION ALL
  SELECT s.conv_id, s.seg,
    CASE WHEN best_score >= {minscore} THEN best_p - 1 ELSE len(r.paths) END,
    CASE WHEN best_score >= {minscore}
      THEN r.paths[1:best_p-1] || [{{'t': s.et, 'v': s.ev}}]
           || r.paths[best_p+1:len(r.paths)]
      ELSE list_append(r.paths, {{'t': s.et, 'v': s.ev}}) END
  FROM rec r JOIN segs s ON s.conv_id = r.conv_id AND s.seg = r.seg + 1,
  LATERAL (
    SELECT list_max(scores) AS best_score,
      len(scores) - list_position(list_reverse(scores), list_max(scores)) + 1
        AS best_p
    FROM (SELECT list_transform(r.paths, p ->
      CASE WHEN abs(s.sv - p.v) / greatest((s.st - p.t)/1e6, 1e-6) >= {max_rate}
             OR abs(s.sv - p.v) >= 2.0 * {max_jump}
           THEN -1.0
           ELSE {max_jump} / greatest(
             abs(s.sv - p.v) / greatest((s.st - p.t)/1e6, 1e-6), 1e-9)
      END) AS scores)
  )
)
SELECT sr.conv_id, sr.turn_idx, sr.ts, sr.value,
  CAST(r.assigned AS INTEGER) AS pathway_id
FROM segrows sr JOIN rec r USING (conv_id, seg)"""


@query("encode_pathways", _pathways_oracle())
def encode_pathways_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoising encoder: score-based greedy segment→pathway attachment
    (aisdb/denoising_encoder.py:99-228, src/lib.rs:475-497). Oracle: the
    same greedy machine recomputed in DuckDB as a recursive CTE over
    list-struct state (see _pathways_oracle)."""
    return encoder.encode_pathways(
        _tv(spark, sf_dir), max_jump=4.0, max_rate=0.001, minscore=1e-6
    )


@query(
    "discontinuity_split",
    f"""{_PRELUDE},
filtered AS (SELECT conv_id, turn_idx, ts FROM tv WHERE value >= 15),
flagged AS (
  SELECT conv_id, turn_idx, ts,
    CASE WHEN turn_idx - lag(turn_idx)
      OVER (PARTITION BY conv_id ORDER BY turn_idx) > 1
    THEN 1 ELSE 0 END AS flag
  FROM filtered
)
SELECT conv_id, turn_idx, ts,
  CAST(sum(flag) OVER (PARTITION BY conv_id ORDER BY turn_idx
    ROWS UNBOUNDED PRECEDING) AS INTEGER) AS segment_id
FROM flagged""",
)
def discontinuity_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-discontinuity split after filtering (anti-meridian analog,
    aisdb/track_gen.py:38-64)."""
    from aisdb_spark.operators import segmentation as seg

    filtered = _tv(spark, sf_dir).filter(F.col("value") >= 15).select(
        "conv_id", "turn_idx", "ts"
    )
    return seg.discontinuity_split(filtered, max_idx_jump=1)


def _spline_oracle(step_seconds: int = 600) -> str:
    """Bit-exact DuckDB oracle for the natural-cubic-spline kernel.

    The Thomas tridiagonal solve is two sequential recurrences; both are
    replayed as recursive CTEs (``fwd`` carries (mu, z) knot-by-knot,
    ``bwd`` carries c from the far end), all segments advancing in
    lockstep. Polynomial evaluation uses explicit multiply chains on BOTH
    sides (the Spark kernel avoids ``dx**3`` because numpy's SIMD pow
    rounds differently from libm), so every double op is IEEE-identical
    and the comparison is exact, not approximate.
    """
    step_us = step_seconds * 1_000_000
    return f"""{_PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1)},{_SEG_CTE},
sdedup AS (
  SELECT conv_id, segment_id, epoch_us(ts) AS t_us, CAST(value AS DOUBLE) AS y
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY conv_id, segment_id, ts ORDER BY turn_idx DESC) AS rn
    FROM segd
  ) WHERE rn = 1
),
spts AS (
  SELECT conv_id, segment_id,
    CAST(row_number() OVER wp - 1 AS BIGINT) AS i, t_us, y,
    CAST(t_us - first(t_us) OVER wp AS DOUBLE) AS x,
    count(*) OVER (PARTITION BY conv_id, segment_id) AS npts
  FROM sdedup WINDOW wp AS (PARTITION BY conv_id, segment_id ORDER BY t_us)
),
good AS (SELECT * FROM spts WHERE npts >= 3),
knot AS (
  SELECT conv_id, segment_id, i, x, y, npts, npts - 1 AS n,
    lead(x) OVER wk - x AS h,
    lag(x) OVER wk AS x_prev, lead(x) OVER wk AS x_next,
    lead(y) OVER wk AS y_next,
    x - lag(x) OVER wk AS h_prev,
    CASE WHEN i >= 1 AND i <= npts - 2 THEN
      3.0 * (lead(y) OVER wk - y) / (lead(x) OVER wk - x)
      - 3.0 * (y - lag(y) OVER wk) / (x - lag(x) OVER wk)
    END AS alpha
  FROM good WINDOW wk AS (PARTITION BY conv_id, segment_id ORDER BY i)
),
fwd AS (
  SELECT conv_id, segment_id, CAST(0 AS BIGINT) AS i,
    CAST(0.0 AS DOUBLE) AS mu, CAST(0.0 AS DOUBLE) AS z, n
  FROM knot WHERE i = 0
  UNION ALL
  SELECT k.conv_id, k.segment_id, k.i,
    k.h / (2.0 * (k.x_next - k.x_prev) - k.h_prev * f.mu),
    (k.alpha - k.h_prev * f.z) / (2.0 * (k.x_next - k.x_prev) - k.h_prev * f.mu),
    f.n
  FROM fwd f JOIN knot k ON k.conv_id = f.conv_id
    AND k.segment_id = f.segment_id AND k.i = f.i + 1
  WHERE f.i + 1 <= f.n - 1
),
bwd AS (
  SELECT conv_id, segment_id, n AS j, CAST(0.0 AS DOUBLE) AS c, n AS n2
  FROM fwd WHERE i = 0
  UNION ALL
  SELECT b.conv_id, b.segment_id, b.j - 1, f.z - f.mu * b.c, b.n2
  FROM bwd b JOIN fwd f ON f.conv_id = b.conv_id
    AND f.segment_id = b.segment_id AND f.i = b.j - 1
  WHERE b.j - 1 >= 0
),
coef AS (
  SELECT k.conv_id, k.segment_id, k.x, k.y,
    (k.y_next - k.y) / k.h - k.h * (c1.c + 2.0 * c0.c) / 3.0 AS b,
    c0.c AS c,
    (c1.c - c0.c) / (3.0 * k.h) AS d
  FROM knot k
  JOIN bwd c0 ON c0.conv_id = k.conv_id AND c0.segment_id = k.segment_id
    AND c0.j = k.i
  JOIN bwd c1 ON c1.conv_id = k.conv_id AND c1.segment_id = k.segment_id
    AND c1.j = k.i + 1
  WHERE k.i <= k.npts - 2
),
sbounds AS (
  SELECT conv_id, segment_id, min(t_us) AS t0, max(t_us) AS t_end,
    max(x) AS x_end,
    max(CASE WHEN i = npts - 1 THEN y END) AS y_end
  FROM good GROUP BY 1, 2
),
sgrid AS (
  SELECT b.conv_id, b.segment_id, g.g AS t_g,
    CAST(g.g - b.t0 AS DOUBLE) AS gx, b.x_end, b.y_end
  FROM sbounds b, LATERAL (
    SELECT unnest(generate_series(b.t0, b.t_end + {step_us} - 1, {step_us})) AS g
  ) g
)
SELECT g.conv_id, g.segment_id, make_timestamp(g.t_g) AS ts,
  CASE WHEN g.gx > g.x_end THEN g.y_end
       ELSE co.y + co.b * (g.gx - co.x)
            + co.c * ((g.gx - co.x) * (g.gx - co.x))
            + co.d * (((g.gx - co.x) * (g.gx - co.x)) * (g.gx - co.x))
  END AS value
FROM sgrid g
ASOF JOIN coef co
  ON co.conv_id = g.conv_id AND co.segment_id = g.segment_id AND g.gx >= co.x"""


@query("interp_cubic_spline", _spline_oracle(600))
def interp_cubic_spline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Natural-cubic-spline resample (aisdb/interp.py:273-356 semantics,
    numpy tridiagonal solve in place of scipy). Oracle: the tridiagonal
    sweeps replayed as recursive CTEs in DuckDB (_spline_oracle)."""
    segd = seg_mod.gap_split(_tv(spark, sf_dir), gap_seconds=3600)
    return interp.interp_cubic_spline(segd, step_seconds=600)


@query("pipeline_canonical", _pathways_oracle(10.0, 1.0, 1e-5))
def pipeline_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship chain (aisdb/network_graph.py:504-519 graft): enrich →
    derived scalar → gap split → pathways; returns the pathway frame.
    Oracle: the enrichment joins are row-preserving (left joins on conv_id /
    dim) and the encoder consumes only (conv_id, turn_idx, ts, value), so
    the end-to-end output must equal the DuckDB pathway machine at the
    pipeline's default parameters — verifying composition, not just the
    final operator."""
    from aisdb_spark.plans import pipeline

    stages = pipeline.canonical_pipeline(spark, _tv(spark, sf_dir))
    return stages["pathways"]


# ---------------------------------------------------------------------------
# Milestone 8: events-native sessionization + scalar function surface.
# ---------------------------------------------------------------------------


@query(
    "user_sessions",
    """WITH flagged AS (
  SELECT user_id, event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
    THEN 1 ELSE 0 END AS flag
  FROM events
),
sess AS (
  SELECT *, sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
  min(ts) AS session_start, max(ts) AS session_end,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(cents) AS BIGINT) AS sum_cents
FROM sess GROUP BY 1, 2""",
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization straight on the events stream table —
    the batch twin of the streaming session_window idiom."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flag = F.when(gap > 1_800_000_000, F.lit(1)).otherwise(F.lit(0))
    sess = ev.withColumn("cents", F.expr("CAST(round(value * 100) AS BIGINT)")).withColumn(
        "session_id",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )


@query(
    "streaming_rollup_1min",
    """WITH c AS (
  SELECT date_trunc('minute', ts) AS bucket_start, user_id, ts, event_id,
    CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT bucket_start, user_id, CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(cents) AS BIGINT) AS sum_cents, min(cents) AS min_cents,
  max(cents) AS max_cents,
  first(cents ORDER BY ts, event_id) AS first_cents,
  last(cents ORDER BY ts, event_id) AS last_cents
FROM c GROUP BY 1, 2""",
)
def streaming_rollup_1min_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming path driven to completion (SURVEY.md §2.8 —
    reference live receiver ``aisdb/receiver.py:6-57`` re-expressed as
    readStream → watermarked 1-minute window → availableNow drain). The
    order-dependent first/last measures are carried as min_by/max_by over
    the total event order (ts, event_id), so micro-batch boundaries cannot
    change the result; the oracle recomputes them batch-side in DuckDB.
    Drained scalably (round 3): update-mode ``foreachBatch`` replaces
    updated keys in a day-partitioned parquet tier and the result is the
    tier read-back — no complete-mode memory sink."""
    from aisdb_spark.streaming import rollup_stream

    return rollup_stream.drained_rollup_1min(
        spark, sf_dir, glob="events.parquet"
    )


@query(
    "streaming_user_sessions",
    """WITH flagged AS (
  SELECT user_id, ts, event_id, CAST(floor(value * 100) AS BIGINT) AS cents,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800000000
    THEN 1 ELSE 0 END AS flag
  FROM events
),
sess AS (
  SELECT *, sum(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(cents) AS BIGINT) AS sum_cents
FROM sess GROUP BY user_id, sid""",
)
def streaming_user_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization drained scalably: raw events stream through
    ``foreachBatch`` → per-micro-batch sessionization → algebraic interval
    merge into a day-partitioned tier (streaming/rollup_stream.py) — the
    Spark expression of the reference receiver's insert-time absorption
    (``aisdb/receiver.py:6-57``), with tier state on disk instead of a
    driver memory sink. Uses session_window's gap rule (split on
    >= 1800000000 µs; the batch user_sessions query keeps AISdb's > rule —
    both exact, each oracle encodes its side). The native session_window
    operator itself is ``stream_user_sessions``, append-mode
    pytest-covered (update mode is unsupported for session windows and
    append withholds the un-finalized tail, so it can't drain to
    completion)."""
    from aisdb_spark.streaming import rollup_stream

    return rollup_stream.drained_user_sessions(
        spark, sf_dir, glob="events.parquet"
    )


@query(
    "late_upsert_1min",
    f"""{_PRELUDE}
SELECT conv_id, date_trunc('minute', ts) AS bucket_start,{_ROLLUP_MEASURES}
FROM tv GROUP BY 1, 2""",
)
def late_upsert_1min_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data upsert path (SURVEY.md §2.4/§2.8; reference insert-time PK
    absorption ``aisdb/database/decoder.py:199-259``): the raw turns arrive
    in two waves — on-time (even turn_idx) then LATE (odd turn_idx, which
    revisits every already-materialized bucket) — each drained through the
    exactly-once ``foreachBatch`` upsert into the partial-carrying 1min
    tier with dynamic partition overwrite (streaming/upsert.py). The oracle
    is the plain one-shot batch rollup of the FULL input: equality proves
    the incremental merge converges to the batch answer."""
    from pyspark.sql import types as T

    from aisdb_spark.streaming import fsio
    from aisdb_spark.streaming import upsert as ups

    tv = _tv(spark, sf_dir).select("conv_id", "turn_idx", "ts", "value")
    base = fsio.scratch_dir("spark_upsert_")
    landing, tier, ck = (f"{base}/{d}" for d in ("landing", "tier", "ck"))
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", tv.schema["turn_idx"].dataType),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", tv.schema["value"].dataType),
        ]
    )

    def drain():
        ups.stream_upsert_1min(
            spark, landing, tier, ck, schema, glob="part-*.parquet"
        )

    tv.filter(F.pmod("turn_idx", F.lit(2)) == 0).write.parquet(f"{landing}/w1")
    drain()
    tv.filter(F.pmod("turn_idx", F.lit(2)) == 1).write.parquet(f"{landing}/w2")
    drain()
    return ups.read_tier_public(spark, tier)


@query("streaming_ewma_03", _ewma_oracle(0.3))
def streaming_ewma_03_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming EWMA via ``applyInPandasWithState`` — per-conv
    (ow, avg) state carried in the state store across micro-batches
    (streaming/stateful.py; the streaming twin of ewma_03, reference
    gap-fill ``aisdb/interp.py:57-118``). Drained as one wave the
    virgin-state path is pandas' own kernel, so this reuses ewma_03's
    bit-exact recursive-CTE oracle; cross-batch state continuation is
    covered by tests/test_stateful_stream.py (≤1e-9 IEEE drift bound)."""
    from pyspark.sql import types as T

    from aisdb_spark.streaming import fsio, stateful

    tv = _tv(spark, sf_dir).select("conv_id", "turn_idx", "ts", "value")
    base = fsio.scratch_dir("spark_sewma_")
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", tv.schema["turn_idx"].dataType),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", tv.schema["value"].dataType),
        ]
    )
    tv.coalesce(1).write.parquet(f"{base}/landing/w0")
    return stateful.drain_ewma(
        spark,
        f"{base}/landing",
        schema,
        f"{base}/out",
        f"{base}/ck",
        alpha=0.3,
        glob="part-*.parquet",
    )


@query(
    "retention_compaction",
    f"""{_PRELUDE}
SELECT conv_id, date_trunc('minute', ts) AS bucket_start,{_ROLLUP_MEASURES}
FROM tv
WHERE CAST(ts AS DATE) >= (SELECT min(CAST(ts AS DATE)) FROM tv) + INTERVAL 1 DAY
GROUP BY 1, 2""",
)
def retention_compaction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier maintenance end-to-end (reference monthly DROP TABLE
    ``aisdb/database/dbconn.py:147,467``; TimescaleDB drop_chunks +
    recompression): materialize the cascade, fragment the 1min tier's first
    day partition (as many tiny upserts would), bin-pack it back with a
    checksum-verified compaction, then drop the oldest day via the
    retention policy. The oracle is the batch rollup restricted to the
    surviving dates — equality proves retention dropped exactly the right
    partitions and compaction changed no row anywhere."""
    from aisdb_spark import checkpoint, maintenance
    from aisdb_spark.operators import rollup
    from aisdb_spark.streaming import fsio

    tv = _tv(spark, sf_dir)
    base = fsio.scratch_dir("spark_maint_")
    # Only the 1min tier is fragmented/compacted/retained and returned —
    # materializing the full 1h/1d cascade here was dead work (guide §1.2:
    # don't compute things you throw away). Same write path (write_tier)
    # and layout as materialize_cascade's 1min stage.
    tier = f"{base}/1min"
    checkpoint.write_tier(
        rollup.temporal_bin(tv, "minute"), tier, checkpoint.input_fingerprint(tv)
    )
    parts = maintenance._date_partitions(tier)
    # fragment day 0, then compact it back (no-op on the other days)
    frag = (
        spark.read.parquet(parts[0][1])
        .repartition(8)
        .localCheckpoint(eager=True)
    )
    frag.write.mode("overwrite").parquet(parts[0][1])
    report = maintenance.compact_tier(
        spark, tier, target_bytes=1 << 30, min_files_to_compact=4
    )
    assert report["compacted"] == 1, report
    cutoff = parts[0][0] + __import__("datetime").timedelta(days=1)
    maintenance.enforce_retention({"1min": tier}, {"1min": cutoff})
    return spark.read.parquet(tier).select(
        "conv_id",
        "bucket_start",
        "n_turns",
        "sum_value",
        "min_value",
        "max_value",
        "first_value",
        "last_value",
    )


@query(
    "csv_ingest_roundtrip",
    f"""{_PRELUDE}
SELECT 'csvgz' AS route, conv_id, turn_idx, role, text, tool, ts FROM transcripts
UNION ALL
SELECT 'zip' AS route, conv_id, turn_idx, role, text, tool, ts FROM transcripts""",
)
def csv_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-ingest round trips — both archive routes in one driver row
    (registry folded round 4). Identity oracle: every route must preserve
    every column bit-for-bit, micros included.

    - ``csvgz`` (SURVEY.md §2.1; reference decoder dedup
      ``aisdb/database/decoder.py:21-153``): transcripts exported to two
      disjoint CSV shards (one plain, one gzip — the native .csv.gz
      path), ingested through the checksum IngestLedger, committed, and
      idempotence proven (re-ingest returns None);
    - ``zip`` (reference unzip-then-decode
      ``aisdb/database/decoder.py:119-153``): two disjoint CSV shard
      sets packed into .zip archives (plus a non-.csv member that must
      be skipped by the suffix filter, like the reference's), decoded
      via the binaryFile + in-executor zipfile route
      (sources/io.read_transcripts_zip) — archives fan out to executors,
      the driver never touches archive bytes."""
    import glob as _glob
    import os
    import zipfile

    from aisdb_spark.sources import io as sio
    from aisdb_spark.streaming import fsio

    t = load_transcripts(spark, sf_dir)
    half = F.pmod(F.xxhash64("conv_id"), F.lit(2))

    # CSV/zip staging on fsio.scratch_dir (tmpfs default) — same placement
    # and justification as the drain tiers: this box's /tmp is a slow
    # virtual disk; on a cluster this is the local-SSD scratch volume.
    base = fsio.scratch_dir("spark_ingest_")
    sio.write_transcripts_csv(t.filter(half == 0), f"{base}/a", compress=False)
    sio.write_transcripts_csv(t.filter(half == 1), f"{base}/b", compress=True)
    paths = sorted(
        _glob.glob(f"{base}/a/part-*.csv") + _glob.glob(f"{base}/b/part-*.csv.gz")
    )
    ledger = sio.IngestLedger(f"{base}/ledger.json")
    df, commit = sio.ingest_files(spark, paths, ledger)
    commit()
    assert sio.ingest_files(spark, paths, ledger) is None  # idempotent re-run

    zbase = fsio.scratch_dir("spark_zip_")
    for i in range(2):
        sio.write_transcripts_csv(t.filter(half == i), f"{zbase}/csv{i}")
        with zipfile.ZipFile(
            f"{zbase}/arch{i}.zip", "w", zipfile.ZIP_DEFLATED
        ) as zf:
            for p in sorted(_glob.glob(f"{zbase}/csv{i}/part-*.csv")):
                zf.write(p, arcname=f"shard{i}_{os.path.basename(p)}")
            zf.writestr("manifest.txt", "not a csv - skipped by suffix filter")
    zdf = sio.read_transcripts_zip(spark, f"{zbase}/arch*.zip")

    return df.withColumn("route", F.lit("csvgz")).unionByName(
        zdf.withColumn("route", F.lit("zip"))
    )


from aisdb_spark import multimodal  # noqa: E402


@query("multimodal_features", multimodal.multimodal_oracle())
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through mapInPandas with REAL
    decode kernels (BMP struct parsing, stdlib wave) over deterministic
    arithmetic payloads. The oracle recomputes every integer feature in
    closed form from doc_id, so equality proves the encode→decode round
    trip end-to-end (see aisdb_spark/multimodal.py)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    return multimodal.extract_features(multimodal.with_media(docs))
