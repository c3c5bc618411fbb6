"""Streaming-drain twin of bench_large.py (round-3 verdict item 5).

The two registry drain queries are only measured at sf0.1, where harness
overhead dominates (they regressed to ~4.6 s there when round 3 replaced
the complete-mode memory sinks with real tier upserts). This bench runs
the SAME drain machinery over a 20M-event landing corpus in multiple
micro-batches at local[8] (N) vs local[32] (4N), fresh JVM per level, and
measures the claim the round-3 code only argued: per-batch upsert cost is
proportional to the touched partitions/keys, not to tier size.

Protocol per level:
- the sf0.1 events table replicated 200x (user_id/event_id offset per rep
  so the key space scales too: 20M events, 300k users, 30 days);
- six UNIFORM waves (hash split) — each touches all 30 day partitions,
  the worst case for the merge (tier read-back grows every wave);
- one TINY late wave — the first day's rows of one replica (~330 rows,
  1 partition): if per-batch cost tracked tier size this wave would cost
  like wave 6; if it tracks touched partitions it is near-constant-time;
- each wave is drained by a separate availableNow foreachBatch pass over
  the same checkpoint (only new files are processed — the production
  resume pattern, identical to streaming/upsert.stream_upsert_1min), so
  per-wave wall time is clean driver-side timing;
- the same waves then feed the session drain (sessionize + algebraic
  interval merge into the session tier).

Updates BENCH_LARGE.json in place under the "streaming_drain" key.

Usage: python bench_stream_drain.py              # both levels + summary
       python bench_stream_drain.py --worker N   # one level (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPLICATION = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "200"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = (8, 32)
UNIFORM_WAVES = 6


def build_events(spark, rep: int):
    from pyspark.sql import functions as F

    from aisdb_spark.sources.normalize import read_parquet

    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    return (
        ev.crossJoin(reps)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 1_000_000)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 1_000_000_000)
        .drop("rep")
    )


def worker(cpus: int) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aisdb_spark.session import get_spark
    from aisdb_spark.streaming import rollup_stream as rs

    spark = get_spark(f"drain-{cpus}", cpus=cpus, shuffle_partitions=cpus * 2)
    ev = build_events(spark, REPLICATION).cache()
    n = ev.count()
    base = tempfile.mkdtemp(prefix=f"bench_drain_{cpus}_")
    landing = f"{base}/landing"

    # landing waves: 6 uniform hash splits + 1 tiny single-day late wave
    t0 = time.monotonic()
    for w in range(UNIFORM_WAVES):
        (
            ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(UNIFORM_WAVES)) == w)
            .coalesce(8)
            .write.parquet(f"{landing}/w{w}")
        )
    tiny = ev.filter(
        (F.col("event_id") < 1_000_000_000)  # one replica only
        & (F.to_date("ts") == F.lit("2024-01-01"))
    ).cache()
    tiny_rows = tiny.count()
    tiny.coalesce(1).write.parquet(f"{landing}/w_tiny")
    prep_sec = time.monotonic() - t0

    # Direct per-wave upsert timing (the foreachBatch body IS upsert_*;
    # timing it per wave isolates the claim under test: per-batch cost vs
    # touched partitions, without file-source constant overhead noise).
    from aisdb_spark.sources.normalize import ensure_ltz, read_parquet

    rollup_tier = f"{base}/rollup_tier"
    wave_stats = []
    t_roll0 = time.monotonic()
    for i, w in enumerate([f"w{i}" for i in range(UNIFORM_WAVES)] + ["w_tiny"]):
        batch_src = read_parquet(spark, f"{landing}/{w}")
        batch = rs.rollup_measures(batch_src)
        days = batch_src.select(F.to_date("ts")).distinct().count()
        t0 = time.monotonic()
        rs.upsert_rollup_batch(spark, batch, rollup_tier, epoch_id=i)
        wave_stats.append(
            {
                "wave": w,
                "rows": batch_src.count(),
                "touched_days": days,
                "sec": round(time.monotonic() - t0, 2),
            }
        )
    rollup_sec = time.monotonic() - t_roll0
    tier_rows = spark.read.parquet(rollup_tier).count()

    sess_tier = f"{base}/sess_tier"
    sess_stats = []
    t_sess0 = time.monotonic()
    for i, w in enumerate([f"w{i}" for i in range(UNIFORM_WAVES)] + ["w_tiny"]):
        batch_src = read_parquet(spark, f"{landing}/{w}")
        partials = rs.sessionize_events(ensure_ltz(batch_src))
        days = batch_src.select(F.to_date("ts")).distinct().count()
        t0 = time.monotonic()
        rs.upsert_sessions_batch(spark, partials, sess_tier, epoch_id=i)
        sess_stats.append(
            {
                "wave": w,
                "rows": batch_src.count(),
                "touched_days": days,
                "sec": round(time.monotonic() - t0, 2),
            }
        )
    sess_sec = time.monotonic() - t_sess0
    sess_rows = spark.read.parquet(sess_tier).count()

    shutil.rmtree(base, ignore_errors=True)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_events": n,
                "tiny_rows": tiny_rows,
                "prep_sec": round(prep_sec, 2),
                "rollup": {
                    "total_sec": round(rollup_sec, 2),
                    "rows_per_sec": round(n / rollup_sec, 1),
                    "tier_rows": tier_rows,
                    "waves": wave_stats,
                },
                "sessions": {
                    "total_sec": round(sess_sec, 2),
                    "rows_per_sec": round(n / sess_sec, 1),
                    "tier_rows": sess_rows,
                    "waves": sess_stats,
                },
            }
        )
    )


def main() -> None:
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cpus)],
            capture_output=True, text=True, timeout=5400,
        )
        if out.returncode != 0:
            print(out.stderr[-4000:], file=sys.stderr)
            sys.exit(1)
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
    n_, f_ = results[min(results)], results[max(results)]
    factor = max(results) // min(results)

    def eff(section):
        return round(
            n_[section]["total_sec"] / (factor * f_[section]["total_sec"]), 3
        )

    def tiny_vs_uniform(section):
        waves = f_[section]["waves"]
        uniform = [w["sec"] for w in waves if w["wave"] != "w_tiny"]
        tiny = [w for w in waves if w["wave"] == "w_tiny"][0]
        return {
            "uniform_wave_sec_mean": round(sum(uniform) / len(uniform), 2),
            "last_uniform_wave_sec": uniform[-1],
            "tiny_wave_sec": tiny["sec"],
            "tiny_wave_rows": tiny["rows"],
            "tiny_wave_touched_days": tiny["touched_days"],
        }

    summary = {
        "metric": (
            f"multi-micro-batch drain of {n_['n_events']} events "
            f"({UNIFORM_WAVES} uniform waves + 1 single-day late wave), "
            f"local[{min(LEVELS)}] vs local[{max(LEVELS)}], fresh JVM per "
            "level; per-wave upsert timed directly (= the foreachBatch body)"
        ),
        "n_events": n_["n_events"],
        "localN": n_,
        "local4N": f_,
        "rollup_efficiency": eff("rollup"),
        "sessions_efficiency": eff("sessions"),
        "cost_proportionality_rollup": tiny_vs_uniform("rollup"),
        "cost_proportionality_sessions": tiny_vs_uniform("sessions"),
        "note": (
            "cost ∝ touched partitions/keys: the tiny late wave (1 day, "
            "~0.002% of rows) lands against the FULL tier; if per-batch "
            "cost tracked tier size it would cost like a uniform wave — "
            "the measured ratio is the claim's evidence. Uniform waves are "
            "the worst case (every wave touches all 30 day partitions, so "
            "each merge re-reads the whole tier); real late traffic looks "
            "like the tiny wave."
        ),
    }
    try:
        with open("BENCH_LARGE.json") as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    doc["streaming_drain"] = summary
    with open("BENCH_LARGE.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("localN", "local4N")}))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
