"""Scaling-efficiency evidence: the identical rollup job at local[8] (N)
vs local[32] (4N) on the same input, per the two-cluster-size criterion
(no real cluster in this sandbox — parallelism level stands in for
executor count; see BASELINE.md).

Input: a deterministic 100x replication of the sf0.1 transcripts (each
replica gets a distinct conv_id suffix, preserving the per-conversation
distribution) — 10M turns, large enough that compute dominates fixed
local-mode overheads. Each parallelism level runs in a fresh JVM
(subprocess); every stage is timed best-of-3 (first run absorbs codegen +
python-worker warmup).

Two composites are reported:
- compute: rollup cascade (noop sinks, tiers cached), gap segmentation,
  Gorilla compression — the work that scales with executors on a cluster.
- end_to_end: the same cascade but materialized to day-partitioned parquet
  — includes the write path, which in local mode is bounded by one VM's
  disk/page-cache bandwidth (a cluster writes to distributed storage, so
  the local number is a floor, not the architecture's ceiling).

Usage: python bench_scaling.py            # orchestrates both runs
       python bench_scaling.py --worker N # single measurement (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPLICATION = int(os.environ.get("SPARK_GRAFT_SCALE_REP", "200"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark, rep: int):
    from pyspark.sql import functions as F

    from aisdb_spark.sources.transcripts import load_transcripts, with_value

    t = with_value(load_transcripts(spark, SF_DIR))
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    return t.crossJoin(reps).withColumn(
        "conv_id", F.concat_ws("#", "conv_id", "rep")
    ).drop("rep")


def _best_of(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def worker(cpus: int) -> None:
    from aisdb_spark import checkpoint
    from aisdb_spark.operators import codec_arrow, rollup, segmentation
    from aisdb_spark.session import get_spark

    spark = get_spark(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=cpus * 2)
    tv = build_corpus(spark, REPLICATION)
    tv = tv.repartition(cpus * 2, "conv_id")
    tv.cache()
    n = tv.count()  # materialize input once, outside the timed windows

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def cascade_compute():
        t1m = rollup.temporal_bin(tv, "minute").cache()
        t1h = rollup.tier_from_finer(t1m, "hour").cache()
        t1d = rollup.tier_from_finer(t1h, "day")
        noop(t1m)
        noop(t1h)
        noop(t1d)
        t1m.unpersist()
        t1h.unpersist()

    def cascade_write():
        root = "/dev/shm" if os.path.isdir("/dev/shm") else None
        base = tempfile.mkdtemp(prefix=f"scal_{cpus}_", dir=root)
        try:
            checkpoint.materialize_cascade(spark, tv, base, force=True)
        finally:
            shutil.rmtree(base, ignore_errors=True)

    stages = {
        "rollup_cascade_compute": lambda: cascade_compute(),
        "gap_segmentation": lambda: noop(
            segmentation.segment_bounds(segmentation.gap_split(tv, 3600))
        ),
        "gorilla_compress": lambda: noop(
            codec_arrow.compress_partitions_arrow(tv, assume_partitioned=True)
        ),
        "cascade_materialized": lambda: cascade_write(),
    }
    result: dict = {"cpus": cpus, "n_turns": n, "stages": {}}
    for name, fn in stages.items():
        result["stages"][name] = round(_best_of(fn), 2)
    # Decomposition of the codec stage (NOT part of the composite): isolates
    # the JVM sort and the JVM<->Python Arrow pipe from the encode kernel,
    # so each ledger run carries sub-stage evidence of WHERE the single-VM
    # ceiling binds (sort scales superlinearly; the pipe is bus-bound and
    # anti-scales per ipc_pipe_probe; kernel = gorilla_compress - passthrough).
    import pyarrow as pa

    sorted3 = (
        tv.select("conv_id", "turn_idx", "ts", "value")
        .sortWithinPartitions("conv_id", "turn_idx")
        .select("conv_id", "ts", "value")
    )
    tgt = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("ts", pa.timestamp("us", tz="UTC")),
            pa.field("value", pa.float64()),
        ]
    )

    def _ident(it):
        for rb in it:
            yield pa.RecordBatch.from_arrays(
                [rb.column(i).cast(f.type) for i, f in enumerate(tgt)],
                schema=tgt,
            )

    result["codec_decomposition"] = {
        "jvm_sort_only": round(_best_of(lambda: noop(sorted3)), 2),
        "pipe_passthrough": round(
            _best_of(
                lambda: noop(
                    sorted3.mapInArrow(
                        _ident, "conv_id string, ts timestamp, value double"
                    )
                )
            ),
            2,
        ),
    }
    compute = sum(
        result["stages"][k]
        for k in ("rollup_cascade_compute", "gap_segmentation", "gorilla_compress")
    )
    e2e = compute - result["stages"]["rollup_cascade_compute"] + result["stages"][
        "cascade_materialized"
    ]
    result["compute_sec"] = round(compute, 2)
    result["end_to_end_sec"] = round(e2e, 2)
    result["compute_turns_per_sec"] = round(n / compute, 1)
    result["end_to_end_turns_per_sec"] = round(n / e2e, 1)
    print(json.dumps(result))


def bandwidth_probe(n_procs: int, mb: int = 240, reps: int = 5) -> float:
    """Aggregate STREAM-triad memory bandwidth (bytes/s) across n_procs
    processes — the sandbox VM's shared-bus ceiling, measured not asserted."""
    import multiprocessing as mp

    import numpy as np

    def triad(q):
        n = mb * 1_000_000 // 8
        a = np.random.rand(n)
        b = np.random.rand(n)
        c = a + 1.5 * b  # warm pages
        t0 = time.monotonic()
        for _ in range(reps):
            c = a + 1.5 * b  # noqa: F841
        q.put(reps * 3 * a.nbytes / (time.monotonic() - t0))

    q: "mp.Queue" = mp.Queue()
    ps = [mp.Process(target=triad, args=(q,)) for _ in range(n_procs)]
    for p in ps:
        p.start()
    agg = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return agg


def ipc_probe(n_pairs: int, total_mb: int = 400) -> float:
    """Aggregate local-pipe throughput (bytes/s) across n_pairs concurrent
    writer→reader process pairs — the ceiling for ANY JVM↔Python-worker
    exchange on this VM (the Arrow worker protocol rides these pipes). On
    this box pipes ANTI-scale past ~4 concurrent streams (kernel/bus
    contention), which is what pins the codec stage's 4N number; a real
    cluster has its pipes per node, so this ceiling does not transfer."""
    import multiprocessing as mp

    chunk = b"x" * (1 << 20)

    def writer(w):
        for _ in range(total_mb):
            w.send_bytes(chunk)
        w.close()

    def one_pair(q):
        r, w = mp.Pipe(duplex=False)
        p = mp.Process(target=writer, args=(w,))
        t0 = time.monotonic()
        p.start()
        for _ in range(total_mb):
            r.recv_bytes()
        p.join()
        q.put(total_mb * (1 << 20) / (time.monotonic() - t0))

    q: "mp.Queue" = mp.Queue()
    ps = [mp.Process(target=one_pair, args=(q,)) for _ in range(n_pairs)]
    for p in ps:
        p.start()
    agg = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return agg


def main() -> None:
    results = {}
    n_base = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
    for cpus in (n_base, 4 * n_base):
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cpus)],
            capture_output=True, text=True, timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    summary = {
        "metric": (
            f"N->4N scaling efficiency (local[{n_base}] vs local[{4 * n_base}], "
            "identical 20M-turn input, best-of-3 per stage)"
        ),
        "n_turns": results[min(results)]["n_turns"],
        "localN": results[min(results)],
        "local4N": results[max(results)],
    }
    for kind in ("compute", "end_to_end"):
        thr8 = results[min(results)][f"{kind}_turns_per_sec"]
        thr32 = results[max(results)][f"{kind}_turns_per_sec"]
        summary[f"{kind}_speedup"] = round(thr32 / thr8, 2)
        summary[f"{kind}_efficiency"] = round(thr32 / (4 * thr8), 3)
    # Hardware-ceiling context (gate-exception evidence, measured inline):
    # this VM's memory bus saturates near a single thread — if PURE memory
    # streaming only reaches ceiling_efficiency from N to 4N processes, no
    # data-movement-bound job can exceed it on this box. A real cluster
    # adds a memory bus per node, so the N->4N executor criterion does not
    # inherit this ceiling.
    bw_n = bandwidth_probe(n_base)
    bw_4n = bandwidth_probe(4 * n_base)
    ceiling = bw_4n / bw_n / 4
    summary["memory_bus_probe"] = {
        "what": "aggregate numpy STREAM-triad bandwidth, N vs 4N processes",
        "aggregate_gbps_N": round(bw_n / 1e9, 2),
        "aggregate_gbps_4N": round(bw_4n / 1e9, 2),
        "ceiling_efficiency": round(ceiling, 3),
        "compute_efficiency_vs_ceiling": round(
            summary["compute_efficiency"] / ceiling, 3
        ),
    }
    ipc_n = ipc_probe(n_base)
    ipc_4n = ipc_probe(4 * n_base)
    summary["ipc_pipe_probe"] = {
        "what": (
            "aggregate local-pipe throughput, N vs 4N concurrent pairs — "
            "the JVM<->Python Arrow exchange ceiling (per-node on a real "
            "cluster; shared on this single VM)"
        ),
        "aggregate_gbps_N": round(ipc_n / 1e9, 2),
        "aggregate_gbps_4N": round(ipc_4n / 1e9, 2),
        "ceiling_efficiency": round(ipc_4n / ipc_n / 4, 3),
    }
    # per-stage efficiency: which stages scale and which hit the VM ceilings
    st_n = results[min(results)]["stages"]
    st_4n = results[max(results)]["stages"]
    summary["stage_efficiency"] = {
        k: round(st_n[k] / (4 * st_4n[k]), 3) for k in st_n if k in st_4n
    }
    # codec sub-stage efficiencies: JVM sort / Arrow pipe / Python kernel.
    # kernel = gorilla_compress - pipe_passthrough (the passthrough carries
    # the same sort + same bytes both ways; the difference is encode CPU).
    dec_n = results[min(results)].get("codec_decomposition")
    dec_4n = results[max(results)].get("codec_decomposition")
    if dec_n and dec_4n:
        kern_n = results[min(results)]["stages"]["gorilla_compress"] - dec_n[
            "pipe_passthrough"
        ]
        kern_4n = results[max(results)]["stages"]["gorilla_compress"] - dec_4n[
            "pipe_passthrough"
        ]
        summary["codec_decomposition"] = {
            "localN": dec_n,
            "local4N": dec_4n,
            "efficiency": {
                "jvm_sort_only": round(
                    dec_n["jvm_sort_only"] / (4 * dec_4n["jvm_sort_only"]), 3
                ),
                "pipe_passthrough": round(
                    dec_n["pipe_passthrough"] / (4 * dec_4n["pipe_passthrough"]),
                    3,
                ),
                "encode_kernel": round(kern_n / (4 * kern_4n), 3)
                if kern_n > 0 and kern_4n > 0
                else None,
            },
        }
    print(json.dumps(summary))
    with open("SCALING.json", "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
