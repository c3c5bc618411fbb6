"""Round-6 extra benchmarks: per-query noop-sink isolation with repeats.

NOT part of the frozen driver contract (bench.py is the measured surface).
This harness exists for optimization-guide §1.4-style isolation: each
query is executed to completion through the noop sink N times and the
best time is reported (this sandbox VM has heavy transient noise — single
samples routinely spike 3-10x, see the `all` arrays in the output).

Usage:
    python bench_extra.py                 # all headline queries, 4 reps
    python bench_extra.py ewma_03 lttb_64 # a subset
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (default 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "4"))


def main() -> None:
    from aisdb_spark.queries import QUERIES
    from aisdb_spark.session import get_spark
    from aisdb_spark.sources.transcripts import load_transcripts, with_value

    spark = get_spark("bench_extra", cpus=CPUS)
    tv = with_value(load_transcripts(spark, SF_DIR))
    n_turns = tv.count()  # warm the events scan

    names = sys.argv[1:] or [n for n in QUERIES]
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        times = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
        out[name] = {"best": min(times), "all": times}
        print(f"{name}: best={min(times)} all={times}", file=sys.stderr)
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "n_turns": n_turns,
                      "reps": REPS, "queries": out}))


if __name__ == "__main__":
    main()
