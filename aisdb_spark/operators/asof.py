"""As-of (nearest/backward) joins.

AISdb resolves environmental lookups by nearest-neighbour selection:
weather ``sel(..., method="nearest")`` on (lat, lon, time)
(``aisdb/weather/data_store.py:160-168``, ``:272-281``) and raster pixel
lookup via vectorized binary search on sorted axes
(``aisdb/webdata/load_raster.py:58-76``, ``src/lib.rs:514-539``
``binarysearch_vector``). Spark lacks a native as-of join; two idiomatic
forms, chosen by reference-side size:

- ``asof_join_keyed`` — the scalable path: union probe+reference rows,
  one window per key carrying the last reference value forward
  (``last(..., ignorenulls=True)``). One shuffle on the key; no UDF; works
  at any reference size.
- ``asof_lookup_broadcast`` — the raster path: reference is small ⇒
  broadcast its sorted arrays and ``np.searchsorted`` inside a pandas UDF
  (the direct re-expression of ``binarysearch_vector``).

Both use backward semantics inclusive of equal timestamps (largest
reference ts ≤ probe ts), matching DuckDB's ``ASOF JOIN`` for the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_keyed(
    left: DataFrame,
    right: DataFrame,
    key: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("ref_value",),
) -> DataFrame:
    """Backward as-of join per key: append, for each left row, the latest
    right row's ``value_cols`` (and ``ref_ts``) with right.ts ≤ left.ts.

    right must be unique per (key, right_ts) — pre-aggregate if not.
    """
    lcols = left.columns
    probe = left.withColumn("_is_ref", F.lit(0)).withColumn(
        "_t", F.col(left_ts)
    )
    for c in value_cols:
        probe = probe.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    probe = probe.withColumn("_ref_ts", F.lit(None).cast("timestamp"))
    ref = right.withColumn("_is_ref", F.lit(1)).withColumn(
        "_t", F.col(right_ts)
    ).withColumn("_ref_ts", F.col(right_ts))
    for c in lcols:
        if c not in ref.columns:
            ref = ref.withColumn(c, F.lit(None))
    ref = ref.select(*[F.col(c) for c in probe.columns])
    unioned = probe.unionByName(ref)
    # reference rows sort before probe rows at equal ts → inclusive ≤
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_is_ref").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "ref_ts", F.last(F.when(F.col("_is_ref") == 1, F.col("_ref_ts")), True).over(w)
    )
    for c in value_cols:
        carried = carried.withColumn(
            f"ref_{c}" if not c.startswith("ref_") else c,
            F.last(F.when(F.col("_is_ref") == 1, F.col(c)), True).over(w),
        )
    return carried.filter(F.col("_is_ref") == 0).drop("_is_ref", "_t", "_ref_ts")


def asof_cumulative_count(
    spark: SparkSession,
    probe: DataFrame,
    ref: DataFrame,
    ref_ts: str = "ts",
    left_ts: str = "ts",
    out_col: str = "ref_value",
    n_buckets: int | None = None,
) -> DataFrame:
    """Global (un-keyed) backward as-of against a *cumulative count* of
    reference events: for each probe row, the number of reference rows with
    ``ref.ts <= probe.ts`` (NULL if none) — exactly DuckDB's
    ``ASOF LEFT JOIN`` onto ``row_number() OVER (ORDER BY ts)``.

    This is the scale-safe replacement for collect-and-broadcast when the
    reference grows with the fact table (round-1 scale-killer: signups are a
    constant *fraction* of events, so collecting them is a driver OOM at
    100 TB). Distributed prefix-sum in three bounded steps:

    1. reference → count per unique ts (one shuffle, map-side combine);
    2. equal-width time buckets (``n_buckets`` ≈ 2×parallelism): per-bucket
       totals (≤ n_buckets rows) → exclusive prefix offsets via one tiny
       single-partition window — the only globally-ordered step, O(buckets)
       not O(rows); offsets broadcast (bounded by parallelism, not data);
    3. in-bucket cumulative via a bucket-partitioned window, then the
       union-window as-of (:func:`asof_join_keyed`) keyed on bucket.

    A probe with no in-bucket reference at/before it falls back to its
    bucket's offset; offset 0 means no reference anywhere before → NULL
    (matching ASOF LEFT JOIN). Skew note: bursty references concentrate
    *unique-ts* rows in few buckets, but those are already aggregated
    counts; probe-side bucket population mirrors the data's own time
    distribution — subdividing hot buckets (salting on a second-level
    ``floor(ts/width')``) is the refinement if a profile shows one.
    Reference pattern: ``aisdb/webdata/load_raster.py:27-79`` is the
    genuinely dim-sized case (use :func:`asof_lookup_broadcast` there).
    """
    n_buckets = n_buckets or spark.sparkContext.defaultParallelism * 2
    u = ref.groupBy(F.col(ref_ts).alias("_rts")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    bounds = u.agg(
        F.min(F.unix_micros("_rts")).alias("lo"),
        F.max(F.unix_micros("_rts")).alias("hi"),
    ).first()  # two scalars — bounded driver transfer
    if bounds["lo"] is None:  # empty reference: every probe row gets NULL
        return probe.withColumn(out_col, F.lit(None).cast("double"))
    lo = int(bounds["lo"])
    width = max((int(bounds["hi"]) - lo) // n_buckets, 1)

    def bucket_of(c):
        return (
            F.least(
                F.greatest(
                    F.floor((F.unix_micros(c) - F.lit(lo)) / F.lit(width)),
                    F.lit(0),
                ),
                F.lit(n_buckets - 1),
            )
        ).cast("int")

    ub = u.withColumn("_bucket", bucket_of(F.col("_rts")))
    # exclusive prefix offsets over ALL n_buckets (empty ones included so
    # probes landing in a reference-free bucket still resolve)
    totals = (
        spark.range(n_buckets)
        .select(F.col("id").cast("int").alias("_bucket"))
        .join(ub.groupBy("_bucket").agg(F.sum("_cnt").alias("_tot")), "_bucket", "left")
        .fillna(0, subset=["_tot"])
    )
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_offset", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_bucket", "_offset")
    w_cum = (
        Window.partitionBy("_bucket")
        .orderBy("_rts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    refc = (
        ub.withColumn("_local", F.sum("_cnt").over(w_cum))
        .join(F.broadcast(offsets), "_bucket")
        .select(
            "_bucket",
            "_rts",
            (F.col("_local") + F.col("_offset")).cast("double").alias("ref_value"),
        )
    )
    probeb = probe.withColumn("_bucket", bucket_of(F.col(left_ts)))
    carried = asof_join_keyed(
        probeb,
        refc,
        key="_bucket",
        left_ts=left_ts,
        right_ts="_rts",
        value_cols=("ref_value",),
    )
    return (
        carried.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            out_col,
            F.coalesce(
                F.col("ref_value"),
                F.when(F.col("_offset") > 0, F.col("_offset").cast("double")),
            ),
        )
        .drop("_bucket", "_offset", "ref_ts", "ref_value")
    )


# Hard bound on the driver-collected broadcast reference. The reference
# series this mirrors is dim-sized by construction (the raster grid is
# likewise bounded — aisdb/webdata/load_raster.py:27-79); past ~10M
# entries the collect+broadcast risks driver OOM and the distributed
# as-of join is the right tool, so fail loudly instead of degrading.
ASOF_BROADCAST_MAX = 10_000_000


def asof_lookup_broadcast(
    spark: SparkSession,
    left: DataFrame,
    ref_ts_us: np.ndarray,
    ref_vals: np.ndarray,
    left_ts: str = "ts",
    out_col: str = "ref_value",
) -> DataFrame:
    """Global (un-keyed) backward as-of lookup against a broadcast sorted
    reference — vectorized ``np.searchsorted`` (binarysearch_vector analog).
    Rows before the first reference point get NULL. The reference must be
    dim-sized (≤ :data:`ASOF_BROADCAST_MAX` entries); larger series belong
    in :func:`asof_join_keyed`, the distributed as-of join."""
    n_ref = len(ref_ts_us)
    if n_ref > ASOF_BROADCAST_MAX:
        raise ValueError(
            f"asof_lookup_broadcast reference has {n_ref} entries "
            f"(> ASOF_BROADCAST_MAX={ASOF_BROADCAST_MAX}): a driver-side "
            "broadcast this size risks OOM — use asof_join_keyed (add a "
            "constant key to both sides for a global as-of) instead"
        )
    b_ts = spark.sparkContext.broadcast(np.asarray(ref_ts_us, dtype=np.int64))
    b_v = spark.sparkContext.broadcast(np.asarray(ref_vals, dtype=np.float64))

    @F.pandas_udf(T.DoubleType())
    def _lookup(ts: pd.Series) -> pd.Series:
        t = ts.to_numpy(dtype="datetime64[us]").astype(np.int64)
        idx = np.searchsorted(b_ts.value, t, side="right") - 1
        out = pd.Series(b_v.value[np.clip(idx, 0, None)], dtype="Float64")
        out[idx < 0] = pd.NA  # true NULL (NaN would survive as NaN)
        return out

    return left.withColumn(out_col, _lookup(F.col(left_ts)))
