"""Subprocess worker for test_vanilla_session: run the registry under a
DEFAULT SparkSession — no tuned confs — exactly like the driver harness.

Round-1 failure mode this guards: the driver reads parquet with Spark 4
defaults (inferTimestampNTZ=true), ``ts`` comes back TIMESTAMP_NTZ, and every
``unix_micros(ts)`` raised DATATYPE_MISMATCH at analysis time; the builder's
own tuned session masked it. Analysis (``df.schema``) is where that class of
bug surfaces, so we force analysis of EVERY registry query, and fully execute
the ten formerly-red ones.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

from aisdb_spark.queries import QUERIES  # noqa: E402

# The ten queries that died in CORRECTNESS_r01 with the NTZ AnalysisException.
EXECUTE = [
    "gap_segments",
    "turn_deltas",
    "transition_edges",
    "time_in_range",
    "multi_split_segments",
    "min_rate_filter",
    "interp_time_10min",
    "interp_cubic_spline",
    "pipeline_canonical",
    "user_sessions",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # Vanilla: master only (required to run at all), zero semantic confs.
    spark = SparkSession.builder.master("local[8]").appName("vanilla").getOrCreate()
    failures: list[str] = []
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            _ = df.schema  # forces full analysis — catches DATATYPE_MISMATCH
            if name in EXECUTE:
                n = df.count()
                if n <= 0:
                    failures.append(f"{name}: 0 rows")
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:300]}")
    for f in failures:
        print("FAIL", f)
    print(f"checked {len(QUERIES)} queries, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
