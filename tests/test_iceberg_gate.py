"""Self-skipping Iceberg integration test (round-3 verdict item 6).

The north rule asks for Iceberg tables; this sandbox verifiably lacks the
``iceberg-spark-runtime`` jar and has no network to fetch it (documented
attempt, COVERAGE.md §Iceberg). The engine ships the exact DDL + gated
``overwritePartitions()`` writer (sources/iceberg.py) and an identical
physical layout on plain parquet (sources/tables.py). This test encodes
EXACTLY what flips on when the jar appears: it scans the usual jar
locations and, if found, drives the real catalog end-to-end in a fresh
JVM — DDL with ``days(ts), bucket(64, conv_id)`` partitioning, an
``overwritePartitions`` write, read-back equality against the parquet
layout path, write idempotence, and snapshot accumulation + expiry.
Until then it is skipped-with-reason, not silently green.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

from tests.conftest import SF_SMALL


def _find_iceberg_jar() -> str | None:
    roots = (
        os.environ.get("SPARK_HOME", "/opt/spark") + "/jars",
        os.path.expanduser("~/.ivy2"),
        os.path.expanduser("~/.m2"),
        "/opt/jars",
    )
    for root in roots:
        hits = sorted(
            glob.glob(f"{root}/**/iceberg-spark-runtime*.jar", recursive=True)
        )
        if hits:
            return hits[-1]
    return None


_JAR = _find_iceberg_jar()

_SCRIPT = r"""
import sys
jar, warehouse, sf_dir = sys.argv[1:4]
from pyspark.sql import SparkSession, functions as F
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.jars", jar)
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.ice.type", "hadoop")
    .config("spark.sql.catalog.ice.warehouse", warehouse)
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
from aisdb_spark.sources import iceberg as ice
from aisdb_spark.sources.transcripts import load_transcripts

assert ice.iceberg_available(spark), "jar on classpath but classes missing"
spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.tsdb")
ice.create_transcripts_table(spark, catalog="ice", db="tsdb")
t = load_transcripts(spark, sf_dir).select(
    "conv_id", "turn_idx", "role", "text", "tool", "ts"
)
ice.overwrite_partitions(t, "ice.tsdb.transcripts")
back = spark.table("ice.tsdb.transcripts")
# read-back equality with the source (and hence with the parquet layout,
# which is identity-tested in tests/test_tables.py)
assert back.count() == t.count()
assert back.exceptAll(t).count() == 0 and t.exceptAll(back).count() == 0
# physical layout: partition columns are days(ts) + bucket(64, conv_id)
parts = spark.sql("SELECT partition FROM ice.tsdb.transcripts.files")
pf = [f.name for f in parts.schema["partition"].dataType.fields]
assert pf == ["ts_day", "conv_id_bucket"], pf
# idempotence: a second overwritePartitions converges, rows unchanged
ice.overwrite_partitions(t, "ice.tsdb.transcripts")
assert spark.table("ice.tsdb.transcripts").count() == t.count()
snaps = spark.sql("SELECT COUNT(*) FROM ice.tsdb.transcripts.snapshots").first()[0]
assert snaps >= 2, snaps
# snapshot expiry keeps the latest (checkpoint-resume contract)
spark.sql(
    "CALL ice.system.expire_snapshots(table => 'ice.tsdb.transcripts', "
    "retain_last => 1)"
)
assert spark.table("ice.tsdb.transcripts").count() == t.count()

# --- transactional epoch-gated tier upsert (round-4: closes the
# write-then-rename crash window of streaming/upsert.py) ---
from aisdb_spark.operators import rollup
from aisdb_spark.sources.transcripts import with_value
from aisdb_spark.streaming.upsert import merge_partials, partial_1min

tv = with_value(load_transcripts(spark, sf_dir)).select(
    "conv_id", "turn_idx", "ts", "value"
)
tier = "ice.tsdb.tier_1min"
even = tv.filter(F.pmod("turn_idx", F.lit(2)) == 0)
odd = tv.filter(F.pmod("turn_idx", F.lit(2)) == 1)
assert ice.upsert_batch_iceberg(spark, even, tier, epoch_id=0)
assert ice.last_applied_epoch_iceberg(spark, tier) == 0
assert ice.upsert_batch_iceberg(spark, odd, tier, epoch_id=1)
# replayed epoch: no-op, no new snapshot (data + epoch were ONE commit)
n_snaps = spark.sql(f"SELECT count(*) FROM {tier}.snapshots").first()[0]
assert ice.upsert_batch_iceberg(spark, odd, tier, epoch_id=1) == []
assert spark.sql(f"SELECT count(*) FROM {tier}.snapshots").first()[0] == n_snaps
assert ice.last_applied_epoch_iceberg(spark, tier) == 1
# epoch rides in the LATEST snapshot's own summary, not a side file
latest = spark.sql(
    f"SELECT summary['aisdb.epoch'] FROM {tier}.snapshots "
    "ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"
).first()[0]
assert latest == "1", latest
# converged tier == one-shot batch partials
exp = merge_partials(partial_1min(tv))
got = spark.table(tier).drop("bucket_date")
assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0
# public surface equals the batch rollup
pub = got.select("conv_id", "bucket_start", "n_turns", "sum_value",
                 "min_value", "max_value", "first_value", "last_value")
exp_pub = rollup.temporal_bin(tv, "minute")
assert pub.exceptAll(exp_pub).count() == 0
print("ICEBERG_OK")
"""


@pytest.mark.skipif(
    _JAR is None,
    reason=(
        "iceberg-spark-runtime jar not present in this sandbox (verified "
        "absent; no network to fetch — COVERAGE.md §Iceberg). The test "
        "activates automatically when a jar appears under $SPARK_HOME/jars, "
        "~/.ivy2, ~/.m2, or /opt/jars."
    ),
)
def test_iceberg_ddl_overwrite_and_snapshots(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT, _JAR, str(tmp_path / "wh"), SF_SMALL],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "ICEBERG_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]
