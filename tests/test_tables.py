"""Physical-plan assertions: the materialized table restores pushdown and
partition pruning that the derivation window necessarily blocks."""

from __future__ import annotations

import contextlib
import io

from aisdb_spark.sources import tables
from aisdb_spark.sources.transcripts import load_transcripts
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_materialized_table_pushdown_and_pruning(spark, tmp_path):
    t = load_transcripts(spark, SF_SMALL)
    path = str(tmp_path / "transcripts_tbl")
    tables.write_transcripts_table(t, path)

    q = tables.time_filtered(
        spark, path, "2024-01-10 00:00:00", "2024-01-12 00:00:00"
    )
    plan = _plan(q)
    assert "PushedFilters" in plan and "ts" in plan.split("PushedFilters")[1][:300]
    assert "PartitionFilters" in plan and "ts_date" in plan.split("PartitionFilters")[1][:300]

    # pruning actually cuts data and results stay correct
    full = tables.read_transcripts_table(spark, path)
    want = full.filter(
        (full.ts >= "2024-01-10 00:00:00") & (full.ts <= "2024-01-12 00:00:00")
    )
    assert q.count() == want.count() > 0


def test_materialized_roundtrip_text_equality(spark, tmp_path):
    t = load_transcripts(spark, SF_SMALL)
    path = str(tmp_path / "t2")
    tables.write_transcripts_table(t, path)
    back = tables.read_transcripts_table(spark, path)
    assert back.count() == t.count()
    assert back.select("conv_id", "turn_idx", "text").exceptAll(
        t.select("conv_id", "turn_idx", "text")
    ).count() == 0


def test_broadcast_and_pushdown_in_registry_queries(spark):
    from aisdb_spark.queries import QUERIES

    p = _plan(QUERIES["orders_by_nation"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    p = _plan(QUERIES["pricing_summary"](spark, SF_SMALL))
    assert "LessThanOrEqual(l_shipdate" in p  # pushed to the parquet scan
    assert "l_orderkey" not in p.split("ReadSchema")[1][:300]  # column pruning
