"""Driver-style Spark-vs-DuckDB comparison used by the parity tests.

Mimics the driver's correctness gate: run the Spark query and the
DuckDB oracle on the same parquet tables, then compare row count +
column names + order-insensitive values (sorted by column name,
rounded floats).
"""

from __future__ import annotations

import math
import os

import duckdb

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_value(v):
    """Exact comparison — floats must be BIT-IDENTICAL across engines.

    The derived views and oracles are engineered for this (sequential
    folds, identical operand order/types); exact equality here means
    any driver-side value-hash scheme matches too.
    """
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _norm_rows(columns, rows):
    cols_sorted = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(_norm_value(r[i]) for i in cols_sorted) for r in rows
    )


# The only DuckDB result types whose value hash is stable against the
# Spark side under a dtype-sensitive canonicalizer (pandas conversion).
# HUGEINT/DECIMAL/INTEGER outputs have burned us (r3/r4 driver reds) —
# fence the whole class: every compared oracle column must be one of
# these, widened/stringified in the oracle SQL itself.
HASH_STABLE_TYPES = {"VARCHAR", "BIGINT", "DOUBLE", "BOOLEAN"}


def assert_oracle_types(con, sql: str, name: str = "") -> None:
    """Assert every output column of the oracle query has a
    hash-stable type (VARCHAR/BIGINT/DOUBLE/BOOLEAN)."""
    rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    offenders = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in HASH_STABLE_TYPES
    ]
    assert not offenders, (
        f"{name}: oracle emits hash-hazard column types {offenders}; "
        f"cast to one of {sorted(HASH_STABLE_TYPES)} in the oracle SQL"
    )


def compare(spark_df, con, sql: str, name: str = "") -> None:
    """Assert spark result == duckdb result (order-insensitive)."""
    assert_oracle_types(con, sql, name)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _norm_rows(spark_cols, spark_rows)
    d = _norm_rows(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
