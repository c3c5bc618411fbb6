"""spark-submit entry point: the full retention pipeline as a cluster job.

    spark-submit --master <cluster> --py-files dist/aisdb_spark.zip \
        jobs/run_cascade.py --input /data/sf0.1 --output /data/tiers

Runs: transcripts load → dedup → gap segmentation → materialized
raw→1min→1h→1d cascade (checkpoint/resume manifests) → Gorilla-compressed
per-conversation blobs → metrics JSON on stdout. Master/memory/executors
come from spark-submit; the script only declares the plan.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with events.parquet")
    ap.add_argument("--output", required=True, help="tier output root")
    ap.add_argument("--gap-seconds", type=int, default=3600)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("transcript-cascade").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from aisdb_spark import checkpoint
    from aisdb_spark.operators import codec, dedup, segmentation
    from aisdb_spark.sources.transcripts import load_transcripts, with_value

    tv = with_value(dedup.dedup_turns(load_transcripts(spark, args.input)))
    tiers = checkpoint.materialize_cascade(spark, tv, args.output, force=args.force)
    seg = segmentation.segment_bounds(
        segmentation.gap_split(tv, args.gap_seconds)
    )
    n_segments = seg.count()
    enc = codec.compress_conversations(tv)
    stats = enc.agg(
        {"n_points": "sum", "raw_bytes": "sum", "enc_bytes": "sum"}
    ).collect()[0]
    print(
        json.dumps(
            {
                "tiers": tiers,
                "n_segments": n_segments,
                "codec": {
                    "points": int(stats["sum(n_points)"]),
                    "raw_bytes": int(stats["sum(raw_bytes)"]),
                    "enc_bytes": int(stats["sum(enc_bytes)"]),
                    "ratio": round(
                        stats["sum(raw_bytes)"] / max(stats["sum(enc_bytes)"], 1), 3
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
