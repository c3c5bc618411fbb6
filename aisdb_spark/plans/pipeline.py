"""Canonical operator pipeline — the graft of AISdb's network-graph chain.

The reference's flagship composition (``aisdb/network_graph.py:504-519``):

    vessel_info → wetted_surface_area → split_timedelta →
    encode_greatcircledistance → interp_time → fence_tracks →
    serialize/aggregate

Graft chain (same stage roles, Spark-first):

    enrich (conv_meta + dim join) → derived per-entity scalar →
    gap_split → encode_pathways → interp_time → transition rollup

Each stage is one of the already-tested operators; this module only
composes them, preserving the invariant that rows reach every per-entity
stage grouped by conv_id and ordered by turn_idx (AISdb's global
``ORDER BY 1,2``, enforced per-group here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aisdb_spark.operators import encoder, interp, joins, segmentation


def canonical_pipeline(
    spark: SparkSession,
    tv: DataFrame,
    gap_seconds: int = 3600,
    interp_step: int = 600,
) -> dict[str, DataFrame]:
    """Run the full chain; returns each stage's DataFrame keyed by name."""
    enriched = joins.enrich_transcripts(spark, tv)
    # per-entity derived scalar (wetted-surface-area slot, aisdb/wsa.py:13-114:
    # coef * x^exp by category) — here a role-dependent power of conv size
    scored = enriched.withColumn(
        "conv_scale",
        F.when(F.col("role_txt") == "model", F.pow(F.col("n_turns"), 0.9))
        .otherwise(F.pow(F.col("n_turns"), 0.75)),
    )
    segmented = segmentation.gap_split(scored, gap_seconds)
    pathways = encoder.encode_pathways(segmented)
    interped = interp.interp_time(segmented, interp_step)
    from aisdb_spark.operators import transitions

    edges = transitions.transition_edges(tv, key="role")
    return {
        "enriched": scored,
        "segmented": segmented,
        "pathways": pathways,
        "interpolated": interped,
        "edges": edges,
    }
