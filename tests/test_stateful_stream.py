"""Stateful streaming EWMA: single-batch bit-exactness + cross-batch state.

The streaming twin of operators/interp.ewma via applyInPandasWithState:
a single drain must equal the batch operator bit-for-bit (virgin-state
path is pandas' own kernel); a multi-wave drain must carry (ow, avg) state
across micro-batches and agree to IEEE rounding.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aisdb_spark.operators import interp
from aisdb_spark.sources.transcripts import load_transcripts, with_value
from aisdb_spark.streaming import stateful
from tests.conftest import SF_SMALL


def _tv(spark):
    return with_value(load_transcripts(spark, SF_SMALL)).select(
        "conv_id", "turn_idx", "ts", "value"
    )


def _schema(tv):
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", tv.schema["turn_idx"].dataType),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", tv.schema["value"].dataType),
        ]
    )


def test_single_drain_bit_equals_batch(spark, tmp_path):
    tv = _tv(spark).cache()
    landing = str(tmp_path / "landing")
    tv.coalesce(1).write.parquet(f"{landing}/w0")
    got = stateful.drain_ewma(
        spark, landing, _schema(tv), str(tmp_path / "out"),
        str(tmp_path / "ck"), alpha=0.3, glob="part-*.parquet",
    )
    exp = interp.ewma(tv, alpha=0.3)
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0  # doubles bit-equal
    assert exp.exceptAll(got).count() == 0


def test_state_carries_across_waves(spark, tmp_path):
    tv = _tv(spark).cache()
    landing = str(tmp_path / "landing")
    ck = str(tmp_path / "ck")
    med = tv.approxQuantile("turn_idx", [0.5], 0.0)[0]
    w1 = tv.filter(F.col("turn_idx") <= med)
    w2 = tv.filter(F.col("turn_idx") > med)
    assert w1.count() > 0 and w2.count() > 0
    w1.coalesce(1).write.parquet(f"{landing}/w1")
    out = str(tmp_path / "out")
    r1 = stateful.drain_ewma(
        spark, landing, _schema(tv), out, ck, alpha=0.3,
        glob="part-*.parquet",
    ).collect()
    w2.coalesce(1).write.parquet(f"{landing}/w2")
    r2all = stateful.drain_ewma(
        spark, landing, _schema(tv), out, ck, alpha=0.3,
        glob="part-*.parquet",
    ).collect()
    r2 = [r for r in r2all if (r.conv_id, r.turn_idx) not in
          {(x.conv_id, x.turn_idx) for x in r1}]
    # wave 2 processed ONLY the new file (exactly-once), state restored;
    # the sink accumulates, so r2all = r1 rows + exactly the w2 rows
    assert len(r1) == w1.count() and len(r2) == w2.count()
    assert len(r2all) == len(r1) + len(r2)
    got = {(r.conv_id, r.turn_idx): r.ewma_value for r in r2all}
    exp = {
        (r.conv_id, r.turn_idx): r.ewma_value
        for r in interp.ewma(tv, alpha=0.3).collect()
    }
    assert got.keys() == exp.keys()
    worst = max(
        abs(got[k] - exp[k]) / max(abs(exp[k]), 1e-300) for k in exp
    )
    assert worst <= 1e-9, f"cross-batch continuation drifted: {worst}"
