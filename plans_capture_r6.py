"""Capture .explain('formatted') for the round-6-touched queries.

Usage: python plans_capture_r6.py <repo_root> <suffix>
Runs with cwd-independent PYTHONPATH so the round-start tree can be
captured too (suffix 'before') alongside the current tree ('after').
Streaming-drain queries return a tier read-back; their explain is the
read-back scan — the drain's inner job structure is documented in
OPTIMIZATION_r06.md instead.
"""
import io
import os
import sys
from contextlib import redirect_stdout

root, suffix = sys.argv[1], sys.argv[2]
sys.path.insert(0, root)
os.chdir(root)

SF = "/root/testdata/sf0.1"
OUT = "/root/repo/plans/r06"

from aisdb_spark.session import get_spark  # noqa: E402

spark = get_spark("plans", cpus=32)

import __spark_entry__ as e  # noqa: E402

NAMES = [
    "ewma_03", "lttb_64", "vw_decimate", "encode_pathways",
    "interp_cubic_spline", "interp_time_10min", "gorilla_roundtrip",
    "gorilla_metrics", "minhash_lsh_pairs", "simhash_near_pairs",
    "ngram_jaccard_pairs", "cosine_near_pairs", "dedup_turns",
    "asof_last_tool", "rollup_1min", "salted_rollup_1min",
    "pricing_summary", "orders_by_nation", "time_filter",
    "ann_lsh_top10",
]
qs = e.queries()
for name in NAMES:
    try:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{OUT}/{name}_{suffix}.txt", "w") as f:
            f.write(buf.getvalue())
        print("captured", name, flush=True)
    except Exception as ex:  # noqa: BLE001
        print("FAIL", name, ex, flush=True)
print("DONE")
