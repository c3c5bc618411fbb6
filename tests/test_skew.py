"""Skew-stress: the salted rollup under a ~14%-of-corpus hot key, with the
two-phase plan shape pinned (round-2 verdict item 8)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aisdb_spark.operators import rollup
from aisdb_spark.plans.partitioning import with_salt
from aisdb_spark.sources.transcripts import load_transcripts, with_value
from tests.conftest import SF_SMALL


def _skewed(spark):
    tv = with_value(load_transcripts(spark, SF_SMALL))
    hot = F.when(
        F.substring("conv_id", 6, 20).cast("int") % 7 == 0, F.lit("hot-conv")
    ).otherwise(F.col("conv_id"))
    sk = tv.withColumn("orig", F.col("conv_id")).withColumn("conv_id", hot)
    w = Window.partitionBy("conv_id").orderBy("ts", "orig", "turn_idx")
    return sk.withColumn(
        "turn_idx", (F.row_number().over(w) - 1).cast("int")
    ).select("conv_id", "turn_idx", "ts", "value")


def test_salted_equals_direct_under_hot_key(spark):
    rk = _skewed(spark).cache()
    # the fixture is genuinely adversarial: one key holds >= 10% of rows
    total = rk.count()
    hot_rows = rk.filter(F.col("conv_id") == "hot-conv").count()
    assert hot_rows >= total // 10
    direct = rollup.temporal_bin(rk, "minute")
    salted = rollup.temporal_bin_salted(rk, "minute")
    assert salted.exceptAll(direct).count() == 0
    assert direct.exceptAll(salted).count() == 0


def test_salt_subdivides_hot_groups_and_plan_is_two_phase(spark):
    rk = _skewed(spark).cache()
    # physical plan: partial aggregate keyed on salt BEFORE the merge agg —
    # the grouping that lets many reducers share one hot (conv, bucket)
    salted = rollup.temporal_bin_salted(rk, "minute")
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "salt" in plan, plan[:2000]
    first_agg = plan.index("HashAggregate")
    assert "salt" in plan[first_agg:], "salt missing from aggregate keys"
    # AQE is on in the engine session (runtime coalesce/skew handling)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # and the salt actually subdivides the hot key's largest group — at a
    # coarse bucket where the hot conversation's group is genuinely large
    # (minute buckets at sf0.001 hold only ~2 rows; the skew pressure is
    # per (key, bucket) group size, so measure where it exists)
    direct_max = (
        rk.groupBy("conv_id", F.date_trunc("year", "ts"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    salted_max = (
        with_salt(rk, salt_buckets=8, chunk_rows=16)  # temporal_bin_salted's
        .groupBy("conv_id", F.date_trunc("year", "ts"), "salt")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert salted_max * 4 <= direct_max  # >= 4x subdivision of the hot group
