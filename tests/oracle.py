"""Local DuckDB-oracle comparison mirroring the driver's correctness gate:
run the Spark query and the oracle SQL on the same parquet tables, compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # exact bit-level comparison: the engine's determinism claims are
        # IEEE-exact, so the test should be too (hex round-trips doubles)
        return v.hex()
    return str(v)


def rows_multiset(cols: list[str], rows) -> dict[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict[str, int] = {}
    for r in rows:
        key = "|".join(_canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duck_con(sf_dir)
    odf = con.execute(oracle_sql).fetchall()
    ocols = [d[0] for d in con.description]
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    assert sorted(scols) == sorted(ocols), (scols, ocols)
    assert len(srows) == len(odf), (len(srows), len(odf))
    sm = rows_multiset(scols, srows)
    om = rows_multiset(ocols, odf)
    if sm != om:
        extra_s = {k: v for k, v in sm.items() if om.get(k) != v}
        extra_o = {k: v for k, v in om.items() if sm.get(k) != v}
        raise AssertionError(
            f"value mismatch: spark-only={list(extra_s.items())[:3]} "
            f"oracle-only={list(extra_o.items())[:3]}"
        )
