"""Structured Streaming ingest → windowed rollup.

The reference's live path is a fixed-buffer UDP/TCP receiver flushed to the
DB (``receiver/src/receiver.rs``, ``aisdb/receiver.py:6-57``) with **no
event-time semantics** — late/duplicate data is absorbed by insert-time
dedup. The Spark-first upgrade: ``readStream`` over the landing directory,
an event-time window aggregation with a watermark bounding state, and
``foreachBatch``/``availableNow`` for exactly-once-style batch draining
(the micro-batch analog of the 128/256-message flush buffers,
``src/lib.rs:563-568``).

The streaming aggregation uses the same integer-exact measure set as the
batch tiers INCLUDING first/last: the order-dependent measures are carried
declaratively as ``min_by``/``max_by`` over the total event order
``struct(ts, event_id)`` — commutative, so arrival order and micro-batch
boundaries cannot change the result (no custom state needed; this replaces
round-1's dropped first/last). A drained stream equals the batch
aggregation of the same input on ALL columns — tested in
tests/test_similarity_multimodal_streaming.py.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aisdb_spark.sources.normalize import ensure_ltz, normalize_session

# ts is declared NTZ (raw parquet micros, no session-tz reinterpretation) and
# converted to the UTC instant by ensure_ltz — deterministic under BOTH a
# vanilla driver session and the tuned factory, same as the batch loaders.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_rollup_1min(
    spark: SparkSession,
    landing_dir: str,
    watermark: str = "10 minutes",
    glob: str | None = None,
) -> DataFrame:
    """readStream(parquet landing dir) → per-user 1-minute windowed rollup
    with watermark-bounded state. Integer-exact measures (value→cents).
    ``glob`` filters file names inside the landing dir (the file stream
    source requires a directory basePath)."""
    normalize_session(spark)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    src = ensure_ltz(reader.parquet(landing_dir)).withWatermark("ts", watermark)
    return rollup_measures(src)


def rollup_measures(events: DataFrame) -> DataFrame:
    """The shared aggregation — applied identically to a stream or a batch
    DataFrame, which is what makes the stream==batch test meaningful."""
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        # floor, not round: Spark rounds HALF_UP, DuckDB half-even — floor is
        # the only integer-exact map both engines agree on bit-for-bit
        events.withColumn("cents", F.expr("CAST(floor(value * 100) AS BIGINT)"))
        .groupBy(F.window("ts", "1 minute").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            # first/last by TOTAL event order (ts, event_id): commutative →
            # arrival order / micro-batch boundaries can't change them
            F.min_by("cents", order).alias("first_cents"),
            F.max_by("cents", order).alias("last_cents"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "user_id",
            "n_events",
            "sum_cents",
            "min_cents",
            "max_cents",
            "first_cents",
            "last_cents",
        )
    )


def drain_to_memory(agg: DataFrame, name: str = "stream_out") -> None:
    """Drive the streaming query to completion over the available files
    (availableNow) into a memory sink — the test/drain harness."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_drain_seq = itertools.count()


def drained_rollup_1min(
    spark: SparkSession, landing: str, glob: str | None = None
) -> DataFrame:
    """Run the full streaming path to completion and return the result as a
    batch DataFrame (the driver-query surface for SURVEY §2.8). Unique sink
    name per call so repeat invocations in one session don't collide."""
    name = f"stream_rollup_{next(_drain_seq)}"
    drain_to_memory(stream_rollup_1min(spark, landing, glob=glob), name)
    return spark.table(name)


def stream_user_sessions(
    spark: SparkSession,
    landing_dir: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    glob: str | None = None,
) -> DataFrame:
    """Native streaming sessionization: ``session_window`` merges events
    whose gap is STRICTLY under ``gap`` (the batch twin in queries.py
    user_sessions splits on > gap — boundary semantics differ by one
    microsecond-measure-zero case; the oracle encodes this one's rule).
    State is merged per (user, window) by the SessionWindowStateStore —
    the Spark-native upgrade of the reference receiver's per-entity flush
    buffers (aisdb/receiver.py:6-57)."""
    normalize_session(spark)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    src = ensure_ltz(reader.parquet(landing_dir)).withWatermark("ts", watermark)
    return (
        src.withColumn("cents", F.expr("CAST(floor(value * 100) AS BIGINT)"))
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "sum_cents"
        )
    )


def drained_user_sessions(
    spark: SparkSession, landing: str, glob: str | None = None
) -> DataFrame:
    """Run streaming sessionization to completion → batch DataFrame."""
    name = f"stream_sessions_{next(_drain_seq)}"
    q = (
        stream_user_sessions(spark, landing, glob=glob)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
