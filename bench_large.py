"""Per-operator large-scale bench: the full operator suite at 20M turns
(200x-replicated sf0.1, same corpus as bench_scaling.py) at local[8] (N)
and local[32] (4N), fresh JVM per level. Writes BENCH_LARGE.json.

Round-2 verdict item 9: the sf0.1 headline suite is dominated by fixed
overheads (cascade 4.7 s of 40.8 s), so per-query behavior at scale was
the remaining blind spot for "would this plan survive 100x". This suite
times each operator family on the SAME 20M-turn cached corpus with noop
sinks — no fixed per-query session/scan overhead, pure operator cost —
and reports per-stage N->4N efficiency alongside the throughput.

Rep policy (deterministic, documented in the JSON): each stage runs twice
(best-of-2 absorbs codegen/worker warmup) unless its first rep exceeds
REP_CUTOFF_S, in which case the single measurement stands — keeps the
suite's wall clock bounded without dropping expensive stages.

Usage: python bench_large.py              # both levels + summary
       python bench_large.py --worker N   # one level (internal)
       SPARK_GRAFT_BL_STAGES=gorilla_encode,gorilla_decode python bench_large.py
           # re-measure only the named stages; their numbers are merged
           # into the existing BENCH_LARGE.json stage sets (totals and
           # per-stage efficiency recomputed over the merged sets)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPLICATION = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "200"))
REP_CUTOFF_S = float(os.environ.get("SPARK_GRAFT_REP_CUTOFF", "45"))
LEVELS = (8, 32)


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    import bench_scaling as bs
    from aisdb_spark.operators import (
        asof,
        codec,
        codec_arrow,
        dedup,
        deltas,
        downsample,
        encoder,
        interp,
        mode_agg,
        rollup,
        segmentation,
        timeinrange,
        transitions,
    )
    from aisdb_spark.session import get_spark

    spark = get_spark(f"large-{cpus}", cpus=cpus, shuffle_partitions=cpus * 2)
    tv = bs.build_corpus(spark, REPLICATION)
    tv = tv.repartition(cpus * 2, "conv_id").cache()
    n = tv.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    enc = codec_arrow.compress_partitions_arrow(tv, assume_partitioned=True).cache()
    enc.count()  # pre-materialize encode output for the decode stage
    segd = segmentation.gap_split(tv, gap_seconds=3600)

    stages = {
        # tiers / aggregation
        "rollup_1min": lambda: noop(rollup.temporal_bin(tv, "minute")),
        "rollup_salted_1min": lambda: noop(rollup.temporal_bin_salted(tv, "minute")),
        "mode_agg_conv_meta": lambda: noop(mode_agg.conv_meta(tv)),
        "time_in_range": lambda: noop(timeinrange.time_in_range(tv, 10, 20)),
        # sequence / window
        "gap_segmentation": lambda: noop(segmentation.segment_bounds(segd)),
        "multi_split": lambda: noop(
            segmentation.multi_criteria_split(tv, gap_seconds=3600)
        ),
        "dedup_window": lambda: noop(dedup.dedup_turns(tv.unionByName(tv))),
        "turn_deltas": lambda: noop(deltas.with_deltas(tv)),
        "transition_edges": lambda: noop(transitions.transition_edges(tv)),
        # interpolation / decimation (Python-kernel family)
        "interp_time_expr": lambda: noop(interp.interp_time_expr(segd, 600)),
        "interp_spacing": lambda: noop(interp.interp_spacing(segd, 100)),
        "ewma_gapfill": lambda: noop(interp.ewma(tv, alpha=0.3)),
        "cubic_spline": lambda: noop(interp.interp_cubic_spline(segd, 600)),
        "lttb_64": lambda: noop(downsample.lttb(tv, n_out=64)),
        "vw_decimate": lambda: noop(downsample.vw_decimate(tv)),
        "every_nth_5": lambda: noop(downsample.every_nth(tv, 5)),
        # codec — value+0.0 gives a distinct logical plan so Spark's cache
        # manager can't serve this stage from the pre-materialized `enc`
        # (same bytes through the encoder; first run measured 0.08 s
        # because the identical plan hit the cache)
        "gorilla_encode": lambda: noop(
            codec_arrow.compress_partitions_arrow(
                tv.withColumn("value", F.col("value") + F.lit(0.0)),
                assume_partitioned=True,
            )
        ),
        # decode: arrow (mapInArrow, the round-4 registry default) vs the
        # pandas path it replaced — the delta is pure Arrow→pandas→Arrow
        # conversion cost on identical kernels
        "gorilla_decode": lambda: noop(codec.decompress_conversations_arrow(enc)),
        "gorilla_decode_pandas": lambda: noop(codec.decompress_conversations(enc)),
        # as-of family
        "asof_keyed": lambda: noop(
            asof.asof_join_keyed(
                tv.filter(F.col("role") == "user").select("conv_id", "turn_idx", "ts"),
                tv.filter(F.col("role") == "tool")
                .groupBy("conv_id", "ts")
                .agg(F.max("value").cast("double").alias("ref_value")),
                key="conv_id",
                value_cols=("ref_value",),
            )
        ),
        "asof_prefix_sum": lambda: noop(
            asof.asof_cumulative_count(
                spark,
                tv.select("conv_id", "turn_idx", "ts"),
                tv.filter(F.col("role") == "system").select("ts"),
            )
        ),
        # stateful encoder
        "encode_pathways": lambda: noop(
            encoder.encode_pathways(tv, max_jump=4.0, max_rate=0.001, minscore=1e-6)
        ),
    }

    only = os.environ.get("SPARK_GRAFT_BL_STAGES")
    if only:
        keep = {s.strip() for s in only.split(",")}
        unknown = keep - stages.keys()
        if unknown:
            raise SystemExit(f"unknown stages: {sorted(unknown)}")
        stages = {k: v for k, v in stages.items() if k in keep}

    result: dict = {"cpus": cpus, "n_turns": n, "stages": {}, "reps": {}}
    for name, fn in stages.items():
        t0 = time.monotonic()
        fn()
        first = time.monotonic() - t0
        if first <= REP_CUTOFF_S:
            t0 = time.monotonic()
            fn()
            best, reps = min(first, time.monotonic() - t0), 2
        else:
            best, reps = first, 1
        result["stages"][name] = round(best, 2)
        result["reps"][name] = reps
        print(json.dumps({"stage": name, "cpus": cpus, "sec": round(best, 2)}),
              file=sys.stderr, flush=True)
    total = sum(result["stages"].values())
    result["total_sec"] = round(total, 2)
    result["suite_turns_per_sec"] = round(n * len(stages) / total, 1)
    print(json.dumps(result))


def main() -> None:
    # A stage-filtered run is only meaningful as an in-place update of an
    # existing full-suite file: without one, the output would carry
    # full-suite-looking total_sec/suite_turns_per_sec computed from the
    # filtered stages alone — indistinguishable from a complete run
    # (round-4 ADVICE). Refuse up front, before the expensive levels run.
    if os.environ.get("SPARK_GRAFT_BL_STAGES") and not os.path.exists(
        "BENCH_LARGE.json"
    ):
        sys.exit(
            "SPARK_GRAFT_BL_STAGES is set but there is no BENCH_LARGE.json "
            "to merge into — run the full suite first, then rerun filtered"
        )
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
    # stage-filtered rerun: merge fresh numbers over the prior full stage
    # sets so a codec-only rerun updates those stages in place
    if os.environ.get("SPARK_GRAFT_BL_STAGES") and os.path.exists("BENCH_LARGE.json"):
        with open("BENCH_LARGE.json") as f:
            prior = json.load(f)
        for fresh, side in ((n_, "localN"), (f_, "local4N")):
            for k in ("stages", "reps"):
                merged = dict(prior.get(side, {}).get(k, {}))
                merged.update(fresh[k])
                fresh[k] = merged
            total = sum(fresh["stages"].values())
            fresh["total_sec"] = round(total, 2)
            fresh["suite_turns_per_sec"] = round(
                fresh["n_turns"] * len(fresh["stages"]) / total, 1
            )
    factor = max(results) // min(results)
    summary = {
        "metric": (
            f"per-operator suite at {n_['n_turns']} turns, local[{min(LEVELS)}] "
            f"vs local[{max(LEVELS)}], fresh JVM per level, best-of-2 under "
            f"{REP_CUTOFF_S}s else single rep"
        ),
        "n_turns": n_["n_turns"],
        "localN": n_,
        "local4N": f_,
        "stage_efficiency": {
            k: round(n_["stages"][k] / (factor * f_["stages"][k]), 3)
            for k in n_["stages"]
        },
        "stage_ranking_localN": sorted(
            n_["stages"], key=n_["stages"].get, reverse=True
        ),
        "stage_ranking_local4N": sorted(
            f_["stages"], key=f_["stages"].get, reverse=True
        ),
        "note": (
            "per-stage efficiency is meaningful for stages >= ~5 s; stages "
            "in the 1-5 s range are dominated by fixed task-dispatch "
            "overhead at this corpus size and under-read their true "
            "scaling (their absolute cost at 20M turns is the point: they "
            "are not bottlenecks). Mildly superlinear Python-kernel stages "
            "(lttb/pathways/vw ~1.0-1.1) are real: at local[8] the Python "
            "workers compete with the JVM for the same 8 threads; at "
            "local[32] both pools breathe."
        ),
    }
    # preserve sections other benches own (bench_stream_drain.py writes
    # streaming_drain / replaced_statestore_drain into the same file)
    if os.path.exists("BENCH_LARGE.json"):
        with open("BENCH_LARGE.json") as f:
            prior = json.load(f)
        for k, v in prior.items():
            summary.setdefault(k, v)
    with open("BENCH_LARGE.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k not in ("localN", "local4N")}))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
