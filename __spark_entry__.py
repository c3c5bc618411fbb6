"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (1-minute rollup tier over
transcripts derived from sf0.001 events). ``queries()`` maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) callable;
``oracle_sql()`` gives the DuckDB-equivalent SQL. Both engines derive the
identical transcripts table from the shared ``events`` view via
``aisdb_spark.sources.transcripts.TRANSCRIPTS_CTE`` (portable SQL), so the
comparison is end-to-end row-exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aisdb_spark.queries import QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["rollup_1min"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
