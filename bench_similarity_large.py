"""Near-dup / ANN families at ≥1M synthetic docs, local[8] vs local[32].

Round-4 verdict item 3: every similarity surface is oracle-checked at 500
docs, but the 10⁹-doc banding-occupancy claims (textops.py simhash
constants, similarity.py hyperplane bands) were arithmetic, never a
measurement. This bench synthesizes a 1M-doc corpus with a KNOWN 10%
near-duplicate rate (deterministic — every text token and embedding
component is a hash of (doc ids, position), no RNG state), runs each
family at two parallelism levels with a fresh JVM per level, and reports,
next to the stage timings:

- measured band-bucket occupancy (buckets, max bucket, Σ C(size,2)
  within-bucket comparisons) vs the occupancy PREDICTION computed from
  the same arithmetic the operator docstrings argue with;
- candidate-pair and verified-pair counts (candidate ≈ planted dups +
  predicted random collisions → the banding is doing its job; candidate
  >> that → a quadratic blow-up the 500-doc oracle could never see).

The cosine family is measured at the corpus-scaled band width
(similarity.neardup_r_for: r = log2(n/32) = 15 at 1M) — the default
r=4 is sized for the 500-doc oracle and WOULD go quadratic here
(62.5k docs/bucket → ~2e9 comparisons per band); the predicted-vs-
measured table quantifies exactly that cliff, which is the point.

Corpus construction (docs): groups of 10; doc_id % 10 == 9 copies the
text of doc_id-9 with ONE token appended (~48-token docs → Jaccard
≈ 0.94 on 3-shingle sets), planting 100k true near-dup pairs.
Embeddings: isotropic hash vectors; dup rows add a ±1% perturbation
(cosine ≈ 0.999). Everything is expressed as Spark SQL over range(n) —
no driver-side data generation.

Writes key `similarity_large` into BENCH_LARGE.json (the same
section-ownership pattern as bench_stream_drain.py) and prints the
summary JSON. Usage:

    python bench_similarity_large.py              # both levels + summary
    SPARK_GRAFT_SIM_DOCS=200000 python bench_similarity_large.py  # smaller
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

N_DOCS = int(os.environ.get("SPARK_GRAFT_SIM_DOCS", "1000000"))
LEVELS = (8, 32)
VOCAB = 500          # token vocabulary size
DOC_TOKENS = 48      # tokens per document
DUP_EVERY = 10       # one near-dup per group of 10 docs
EMB_DIM = 64
REP_CUTOFF_S = float(os.environ.get("SPARK_GRAFT_REP_CUTOFF", "60"))

CORPUS_DIR = os.environ.get(
    "SPARK_GRAFT_SIM_CORPUS", f"/tmp/simbench_corpus_{N_DOCS}"
)


def synth_corpus(spark) -> None:
    """documents.parquet + embeddings.parquet in the testdata layout, all
    columns pure Spark SQL over range(N_DOCS)."""
    from pyspark.sql import functions as F

    base = (
        spark.range(N_DOCS)
        .withColumn("is_dup", F.col("id") % DUP_EVERY == DUP_EVERY - 1)
        .withColumn(
            "seed", F.when(F.col("is_dup"), F.col("id") - 1).otherwise(F.col("id"))
        )
    )
    # text: DOC_TOKENS tokens drawn by hash(seed, pos) from a w### vocab;
    # dups append one extra token (jaccard ~ (46)/(47+1+1) ≈ 0.94)
    text = (
        "concat_ws(' ', transform(sequence(1, "
        f"{DOC_TOKENS} + IF(is_dup, 1, 0)), "
        f"p -> concat('w', pmod(hash(seed, p), {VOCAB}))))"
    )
    docs = base.select(
        F.col("id").alias("doc_id"),
        F.expr(text).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), F.col("id") % 4).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.repartition(64).write.mode("overwrite").parquet(
        f"{CORPUS_DIR}/documents.parquet"
    )
    # embeddings: component j = hash(seed, j) mapped to [-1, 1); dup rows
    # perturb each component by hash(id, j, 7) in [-0.01, 0.01) → cos≈0.999
    comp = (
        f"transform(sequence(0, {EMB_DIM - 1}), j -> CAST("
        f"(pmod(hash(seed, j), 2001) - 1000) / 1000.0"
        f" + IF(is_dup, (pmod(hash(id, j, 7), 21) - 10) / 1000.0, 0.0)"
        " AS FLOAT))"
    )
    emb = base.select(
        F.col("id").alias("vec_id"),
        F.expr(comp).alias("embedding"),
        (F.col("id") % 16).cast("int").alias("label"),
    )
    emb.repartition(32).write.mode("overwrite").parquet(
        f"{CORPUS_DIR}/embeddings.parquet"
    )


def occupancy(bands, n_docs: int) -> dict:
    """Measured bucket stats of a (id, band, bkey) frame: bucket count,
    max size, Σ C(size,2) (= within-bucket candidate comparisons, the
    quantity the docstring arithmetic predicts)."""
    from pyspark.sql import functions as F

    row = (
        bands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("buckets"),
            F.max("sz").alias("max_bucket"),
            F.sum(F.expr("sz * (sz - 1) / 2")).alias("comparisons"),
        )
        .first()
    )
    return {
        "buckets": int(row["buckets"]),
        "max_bucket": int(row["max_bucket"]),
        "comparisons": int(row["comparisons"]),
    }


def worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from aisdb_spark import similarity, textops
    from aisdb_spark.session import get_spark

    spark = get_spark(f"simlarge-{cpus}", cpus=cpus, shuffle_partitions=cpus * 4)
    if not os.path.isdir(f"{CORPUS_DIR}/documents.parquet"):
        synth_corpus(spark)
    docs = spark.read.parquet(f"{CORPUS_DIR}/documents.parquet")
    n = docs.count()  # warm the scan

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    r_scaled = similarity.neardup_r_for(n)
    q = similarity.query_vector(spark, CORPUS_DIR, vec_id=0)

    stages = {
        "minhash_lsh_pairs": lambda: noop(textops.lsh_candidate_pairs(docs)),
        "simhash_near_pairs": lambda: noop(textops.simhash_near_pairs(docs)),
        "ngram_jaccard_pairs": lambda: noop(textops.ngram_jaccard_pairs(docs)),
        "cosine_near_pairs_rscaled": lambda: noop(
            similarity.cosine_near_pairs(spark, CORPUS_DIR, r=r_scaled)
        ),
        "ann_lsh_top10": lambda: noop(
            similarity.ann_topk(spark, CORPUS_DIR, q, 10)
        ),
        "ann_ivf_top10": lambda: noop(
            similarity.ivf_topk(spark, CORPUS_DIR, q, 10)
        ),
        "exact_dedup": lambda: noop(textops.exact_dedup(docs)),
    }
    result: dict = {
        "cpus": cpus, "n_docs": n, "r_scaled": r_scaled,
        "stages": {}, "reps": {},
    }
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
    result["docs_per_sec"] = round(n * len(stages) / total, 1)
    print(json.dumps(result))


def measure_occupancy() -> dict:
    """Predicted vs measured banding occupancy + candidate/verified pair
    counts, once, at local[32] (counts are parallelism-independent)."""
    from pyspark.sql import functions as F

    from aisdb_spark import similarity, textops
    from aisdb_spark.session import get_spark

    spark = get_spark("simocc-32", cpus=32, shuffle_partitions=128)
    if not os.path.isdir(f"{CORPUS_DIR}/documents.parquet"):
        synth_corpus(spark)
    docs = spark.read.parquet(f"{CORPUS_DIR}/documents.parquet")
    n = docs.count()
    planted = n // DUP_EVERY  # true near-dup pairs in the corpus
    c2 = n * (n - 1) / 2
    out: dict = {"n_docs": n, "planted_dup_pairs": planted}

    # --- minhash LSH: 4 bands × 2 rows, key cardinality ~P² ≈ 4.6e18 →
    # random collisions ≈ 4·C(n,2)/P² ≈ 0; candidates ≈ planted dups whose
    # both-row minhashes agree in ≥1 band: p = 1-(1-J²)^4, J≈0.94 → ≈1.0
    mh_bands = textops.minhash_band_rows(docs)
    pred = {
        "random_collision_pairs": round(
            textops.LSH_BANDS * c2 / float(textops.MINHASH_P) ** 2, 3
        ),
        "expected_candidates": f"~{planted} (planted, p≈1-(1-0.94^2)^4≈1.0)",
    }
    out["minhash_lsh"] = {
        "prediction": pred,
        "measured": occupancy(mh_bands, n),
        "verified_pairs": textops.lsh_candidate_pairs(docs).count(),
    }

    # --- simhash: 10 bands × 24-bit keys → E[bucket] = n/2^24; random
    # candidate pairs ≈ 10·C(n,2)/2^24 (uniform-key approximation)
    sh_bands = textops.simhash_band_rows(docs).select("doc_id", "band", "bkey")
    out["simhash"] = {
        "prediction": {
            "keys_per_band": 1 << 24,
            "expected_bucket": round(n / (1 << 24), 4),
            "random_candidate_pairs": int(10 * c2 / (1 << 24)),
        },
        "measured": occupancy(sh_bands, n),
        "verified_pairs": textops.simhash_near_pairs(docs).count(),
    }

    # --- ngram/minhash single-row bands: 8 bands, key cardinality P ≈
    # 2^31 → random collisions ≈ 8·C(n,2)/P; candidates dominated by
    # planted dups (each matches a band w.p. J ≈ 0.94 → ≥1 of 8: ≈1.0)
    ng_bands = textops.ngram_band_rows(docs)
    out["ngram_jaccard"] = {
        "prediction": {
            "random_collision_pairs": int(8 * c2 / textops.MINHASH_P),
            "expected_candidates": f"~{planted} planted + random",
        },
        "measured": occupancy(ng_bands, n),
        "verified_pairs": textops.ngram_jaccard_pairs(docs).count(),
    }

    # --- cosine hyperplane LSH: occupancy n/2^r per band. At the oracle
    # default r=4 → n/16 per bucket (quadratic cliff at 1M: ~2e9
    # comparisons/band — PREDICTED here, not run); at r_scaled → ~32/bucket
    emb = similarity.load_embeddings(spark, CORPUS_DIR)
    r_scaled = similarity.neardup_r_for(n)
    planes = similarity.hyperplanes(
        dim=EMB_DIM, n_planes=r_scaled * similarity.NEARDUP_B
    )
    cs_bands = similarity.cosine_band_rows(
        emb, planes, r_scaled, similarity.NEARDUP_B
    ).withColumnRenamed("vec_id", "doc_id")
    b = similarity.NEARDUP_B
    out["cosine_lsh"] = {
        "r_scaled": r_scaled,
        "prediction": {
            "expected_bucket_rscaled": round(n / (1 << r_scaled), 2),
            "random_comparisons_rscaled": int(b * c2 / (1 << r_scaled)),
            "comparisons_at_default_r4": int(b * c2 / 16),
            "note": (
                "default r=4 is sized for the 500-doc oracle; the r4 row "
                "is the predicted quadratic cliff this bench avoids by "
                "scaling r with log2(n) (similarity.neardup_r_for)"
            ),
        },
        "measured_rscaled": occupancy(cs_bands, n),
        "verified_pairs_rscaled": similarity.cosine_near_pairs(
            spark, CORPUS_DIR, threshold=0.99, r=r_scaled
        ).count(),
    }
    print(json.dumps(out))


def main() -> None:
    t_start = time.time()
    results = {}
    for cpus in LEVELS:
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, __file__, "--worker", str(cpus)],
            capture_output=True, text=True, timeout=7200,
        )
        if out.returncode != 0:
            print(out.stderr[-4000:], file=sys.stderr)
            sys.exit(1)
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        print(json.dumps({"level_done": cpus, "sec": round(time.time() - t0)}),
              file=sys.stderr, flush=True)
    occ = subprocess.run(
        [sys.executable, __file__, "--occupancy"],
        capture_output=True, text=True, timeout=7200,
    )
    if occ.returncode != 0:
        print(occ.stderr[-4000:], file=sys.stderr)
        sys.exit(1)
    occupancy_rec = json.loads(occ.stdout.strip().splitlines()[-1])
    n_, f_ = results[min(results)], results[max(results)]
    factor = max(results) // min(results)
    summary = {
        "metric": (
            f"near-dup/ANN families at {n_['n_docs']} synthetic docs "
            f"({100 // DUP_EVERY}% planted near-dups), local[{min(LEVELS)}] vs "
            f"local[{max(LEVELS)}], fresh JVM per level, best-of-2 under "
            f"{REP_CUTOFF_S}s else single rep; occupancy predicted vs measured"
        ),
        "n_docs": n_["n_docs"],
        "localN": n_,
        "local4N": f_,
        "stage_efficiency": {
            k: round(n_["stages"][k] / (factor * f_["stages"][k]), 3)
            for k in n_["stages"]
        },
        "occupancy": occupancy_rec,
        "wall_sec": round(time.time() - t_start, 1),
    }
    bl = {}
    if os.path.exists("BENCH_LARGE.json"):
        with open("BENCH_LARGE.json") as f:
            bl = json.load(f)
    bl["similarity_large"] = summary
    with open("BENCH_LARGE.json", "w") as f:
        json.dump(bl, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k not in ("localN", "local4N")}))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--occupancy":
        measure_occupancy()
    else:
        main()
