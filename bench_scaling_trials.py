#!/usr/bin/env python
"""Run bench_scaling.py N times, report per-trial + median efficiency."""
import json, subprocess, sys, statistics
trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
runs = []
for i in range(trials):
    subprocess.run([sys.executable, "bench_scaling.py"], check=True,
                   capture_output=True, text=True, timeout=3600)
    with open("SCALING.json") as f:
        runs.append(json.load(f))
summary = {
    "trials": runs,
    "compute_efficiency_all": [r["compute_efficiency"] for r in runs],
    "compute_efficiency_median": statistics.median(r["compute_efficiency"] for r in runs),
    "end_to_end_efficiency_median": statistics.median(r["end_to_end_efficiency"] for r in runs),
    "memory_bus_ceiling_efficiency_median": statistics.median(
        r["memory_bus_probe"]["ceiling_efficiency"] for r in runs if "memory_bus_probe" in r
    ),
    "ipc_pipe_ceiling_efficiency_median": statistics.median(
        r["ipc_pipe_probe"]["ceiling_efficiency"] for r in runs if "ipc_pipe_probe" in r
    ),
    "stage_efficiency_median": {
        k: statistics.median(r["stage_efficiency"][k] for r in runs if "stage_efficiency" in r)
        for k in runs[0].get("stage_efficiency", {})
    },
    # min-timing estimator: the best observed time per parallelism level
    # across trials estimates the true cost under one-sided scheduler noise
    # (the composite of per-level bests, NOT the best ratio)
    "compute_efficiency_best_of_trials": round(
        min(r["localN"]["compute_sec"] for r in runs)
        / (4 * min(r["local4N"]["compute_sec"] for r in runs)),
        3,
    ),
    "compute_efficiency_vs_ceiling_median": statistics.median(
        r["memory_bus_probe"]["compute_efficiency_vs_ceiling"] for r in runs if "memory_bus_probe" in r
    ),
    "note": (
        "single-box shared-memory-bus VM: the STREAM-triad and pipe probes are "
        "the measured hardware ceilings for N->4N parallelism here (pipes "
        "ANTI-scale past ~4 concurrent streams); a multi-executor cluster has "
        "a memory bus and Python-worker pipes per node, so neither ceiling "
        "transfers (see BASELINE.md scaling section)"
    ),
}
with open("SCALING.json", "w") as f:
    json.dump(summary, f, indent=1)
print(json.dumps({k: v for k, v in summary.items() if k != "trials"}))
