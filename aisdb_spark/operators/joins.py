"""Enrichment joins: dynamic ⟕ static-aggregate ⟕ dim table.

AISdb's richest query shape joins the dynamic table to the per-mmsi static
aggregate and then to the ``coarsetype_ref`` dim
(``aisdb/aisdb_sql/select_join_dynamic_static_clusteredidx.sql:1-31``,
``aisdb/aisdb_sql/cte_coarsetype.sql:1-7``). Graft:

  transcripts ⟕ conv_meta (on conv_id) ⟕ role_ref (on mode_role)

Physical strategy: ``role_ref`` is a 4-row dim → explicit ``F.broadcast``
(zero shuffle). conv_meta is one-row-per-conversation — at bench scale AQE
broadcasts it; at 100 TB it shuffles on conv_id, the same exchange the fact
side already has, so the join is co-partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aisdb_spark.operators.mode_agg import conv_meta

# coarsetype_ref analog (aisdb/aisdb_sql/coarsetype.sql:1-5): code → text.
ROLE_REF = [
    ("user", "human"),
    ("assistant", "model"),
    ("system", "orchestrator"),
    ("tool", "machine"),
]


def role_ref_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ROLE_REF, "role_code string, role_txt string")


def enrich_transcripts(spark: SparkSession, df: DataFrame) -> DataFrame:
    """transcripts+value → enriched with per-conv mode_role and its dim text.

    Left joins throughout, mirroring the reference's LEFT JOIN chain.
    """
    meta = conv_meta(df).select("conv_id", "mode_role", "n_turns", "created_ts")
    ref = role_ref_df(spark)
    return (
        df.join(meta, "conv_id", "left")
        .join(
            F.broadcast(ref),
            F.col("mode_role") == F.col("role_code"),
            "left",
        )
        .drop("role_code")
    )
