"""Round-6 scale sanity check: do the r6 optimizations hold at 20x bench
scale (2M turns / 100k docs)?  Runs the changed operators on a replicated
corpus under either tree:

    python bench_scalecheck_r6.py /tmp/r5tree   r5   # round-start code
    python bench_scalecheck_r6.py /root/repo    r6   # optimized code

Prints one JSON line per run; compare the two. Replication mirrors
bench_scaling.build_corpus (key space grows with the data).
"""
import json
import os
import sys
import time

root, tag = sys.argv[1], sys.argv[2]
sys.path.insert(0, root)
os.chdir(root)
REP = int(os.environ.get("SCALECHECK_REP", "20"))
SF = "/root/testdata/sf0.1"

from pyspark.sql import functions as F  # noqa: E402

from aisdb_spark.session import get_spark  # noqa: E402

spark = get_spark(f"scalecheck-{tag}", cpus=32)
sc = spark.sparkContext


def build_tv():
    from aisdb_spark.sources.transcripts import load_transcripts, with_value

    tv = with_value(load_transcripts(spark, SF))
    reps = spark.range(REP).select(F.col("id").alias("_rep"))
    big = tv.crossJoin(reps).withColumn(
        "conv_id", F.concat_ws("-", "conv_id", "_rep")
    ).drop("_rep")
    return big


def build_docs():
    from aisdb_spark.sources.normalize import read_parquet

    d = read_parquet(spark, f"{SF}/documents.parquet")
    reps = spark.range(REP).select(F.col("id").alias("_rep"))
    return (
        d.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") * REP + F.col("_rep"))
        .drop("_rep")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


tv = build_tv().localCheckpoint(eager=True)  # fixed input for both trees
docs = build_docs().localCheckpoint(eager=True)
n = tv.count()
nd = docs.count()

from aisdb_spark.operators import (  # noqa: E402
    codec,
    codec_arrow,
    downsample,
    encoder,
    interp,
    segmentation,
)
from aisdb_spark import textops  # noqa: E402

segd = segmentation.gap_split(tv, gap_seconds=3600)

CASES = {
    "ewma": lambda: noop(interp.ewma(tv, alpha=0.3)),
    "lttb": lambda: noop(downsample.lttb(tv, n_out=64)),
    "vw": lambda: noop(downsample.vw_decimate(tv)),
    "encode_pathways": lambda: noop(encoder.encode_pathways(tv)),
    "spline": lambda: noop(interp.interp_cubic_spline(segd, step_seconds=600)),
    "gorilla_arrow": lambda: noop(
        codec.decompress_conversations_arrow(
            codec_arrow.compress_partitions_arrow(tv)
        )
    ),
    "gorilla_chunked": lambda: noop(
        codec.decompress_conversations_chunked(
            codec.compress_conversations_chunked(tv, max_rows=40)
        )
    ),
    "minhash_pairs": lambda: noop(textops.lsh_candidate_pairs(docs)),
    "simhash_pairs": lambda: noop(textops.simhash_near_pairs(docs, max_hamming=3)),
    "ngram_pairs": lambda: noop(textops.ngram_jaccard_pairs(docs, threshold=0.4)),
}

out = {}
for name, fn in CASES.items():
    best = float("inf")
    for _ in range(2):
        sc.setJobDescription(f"scalecheck {tag}: {name}")
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    out[name] = round(best, 2)
    print(f"  {name}: {best:.2f}s", file=sys.stderr, flush=True)

print(json.dumps({"tag": tag, "rep": REP, "n_turns": n, "n_docs": nd,
                  "cases": out}))
