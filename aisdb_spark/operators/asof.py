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
    Rows before the first reference point get NULL."""
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
