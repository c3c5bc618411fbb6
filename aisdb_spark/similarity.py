"""Embedding similarity over the ``embeddings`` table (vec_id, embedding
float[64], label): brute-force cosine top-k (the correctness baseline) and
an LSH-bucketed approximate variant (the scale path).

Cosine is computed with an explicit left fold over DOUBLE-cast elements —
``aggregate(zip_with(...))`` in Spark, ``list_reduce(list_transform(...))``
in DuckDB — with the identical operation order, so scores are bit-equal
across engines (same discipline as the interpolation oracle).

Scale: brute-force is a full scan with a per-row fold (JVM codegen, no
shuffle) + a top-k (TakeOrderedAndProject — no global sort materialized).
The LSH variant buckets by sign patterns against deterministic hyperplanes;
a query probes only its bucket — at 10^9 vectors the scan drops by the
bucket fan-out while the same plan shape holds.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aisdb_spark.sources.normalize import read_parquet


def _vec_literal(vals, duck: bool) -> str:
    body = ", ".join(repr(float(v)) for v in vals)
    return f"[{body}]" if duck else f"array({body})"


def _dot_expr(a: str, b: str, duck: bool) -> str:
    if duck:
        return (
            f"list_reduce(list_transform(list_zip({a}, {b}), "
            f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q)"
        )
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (p, q) -> p + q)"
    )


def cosine_expr(a: str, b: str, duck: bool) -> str:
    return (
        f"({_dot_expr(a, b, duck)}) / "
        f"sqrt(({_dot_expr(a, a, duck)}) * ({_dot_expr(b, b, duck)}))"
    )


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    df.createOrReplaceTempView("embeddings")
    return df


def query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        load_embeddings(spark, sf_dir)
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row.embedding]


def brute_force_topk(
    spark: SparkSession, sf_dir: str, query: list[float], k: int = 10,
    exclude_vec_id: int | None = 0,
) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    q = _vec_literal(query, duck=False)
    cos = F.expr(cosine_expr("embedding", q, duck=False))
    out = emb.select("vec_id", "label", cos.alias("cos"))
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return out.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)


def brute_force_topk_oracle(query: list[float], k: int = 10,
                            exclude_vec_id: int | None = 0) -> str:
    q = _vec_literal(query, duck=True)
    cos = cosine_expr("embedding", q, duck=True)
    where = f"WHERE vec_id != {exclude_vec_id}" if exclude_vec_id is not None else ""
    return f"""SELECT vec_id, label, {cos} AS cos
FROM embeddings {where}
ORDER BY cos DESC, vec_id ASC LIMIT {k}"""


def hyperplanes(dim: int = 64, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (seeded) for sign-bucket LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_expr(planes: np.ndarray) -> str:
    """Spark SQL expr: bucket id = sign-bit pattern vs each hyperplane."""
    terms = []
    for j, p in enumerate(planes):
        dot = _dot_expr("embedding", _vec_literal(p, duck=False), duck=False)
        terms.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def ann_topk(
    spark: SparkSession, sf_dir: str, query: list[float], k: int = 10,
    n_planes: int = 8, exclude_vec_id: int | None = 0,
) -> DataFrame:
    """Approximate top-k: probe only the query's sign bucket (plus Hamming-1
    neighbor buckets for recall), then exact cosine within."""
    planes = hyperplanes(dim=len(query), n_planes=n_planes)
    emb = load_embeddings(spark, sf_dir).withColumn(
        "bucket", F.expr(lsh_bucket_expr(planes))
    )
    qv = np.asarray(query, dtype=np.float64)
    qb = sum((1 << j) for j, p in enumerate(planes) if float(p @ qv) >= 0)
    probe = [qb] + [qb ^ (1 << j) for j in range(n_planes)]  # multi-probe
    q = _vec_literal(query, duck=False)
    cos = F.expr(cosine_expr("embedding", q, duck=False))
    out = (
        emb.filter(F.col("bucket").isin(probe))
        .select("vec_id", "label", cos.alias("cos"))
    )
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return out.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)


def cosine_near_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked on label (at scale the
    block key would be the LSH bucket). Norms are precomputed per vector —
    the pairwise stage folds only the cross dot product (3x less work; the
    oracle mirrors the same norm-then-divide formula)."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id",
        "label",
        "embedding",
        F.expr(f"sqrt({_dot_expr('embedding', 'embedding', False)})").alias("nrm"),
    )
    l, r = emb.alias("l"), emb.alias("r")
    dot = F.expr(_dot_expr("l.embedding", "r.embedding", duck=False))
    return (
        l.join(
            r,
            (F.col("l.label") == F.col("r.label"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec1"),
            F.col("r.vec_id").alias("vec2"),
            (dot / (F.col("l.nrm") * F.col("r.nrm"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def cosine_near_pairs_oracle(threshold: float = 0.95) -> str:
    dot = _dot_expr("l.embedding", "r.embedding", duck=True)
    nrm = _dot_expr("embedding", "embedding", duck=True)
    return f"""WITH e AS (
  SELECT vec_id, label, embedding, sqrt({nrm}) AS nrm FROM embeddings
)
SELECT l.vec_id AS vec1, r.vec_id AS vec2,
  ({dot}) / (l.nrm * r.nrm) AS cos
FROM e l JOIN e r
  ON l.label = r.label AND l.vec_id < r.vec_id
WHERE ({dot}) / (l.nrm * r.nrm) >= {threshold}"""
