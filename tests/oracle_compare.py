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


def _sort_key(row):
    """Total-order sort key over a normalized row: tag each value by
    type class so None (and cross-type columns) can never raise
    ``'<' not supported`` — the r7 doc_graph_triangles failure mode.
    Equality of the sorted row lists is still on the raw normalized
    tuples, so this changes ordering robustness only, not strictness.
    """
    key = []
    for v in row:
        if v is None:
            key.append((0, ""))
        elif isinstance(v, bool):
            key.append((1, v))
        elif isinstance(v, (int, float)):
            key.append((2, v))
        else:
            key.append((3, str(v)))
    return key


def _norm_rows(columns, rows):
    cols_sorted = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        (tuple(_norm_value(r[i]) for i in cols_sorted) for r in rows),
        key=_sort_key,
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


_TRANSCENDENTALS = ("ln", "exp", "log", "log2", "log10")


def unquantized_transcendentals(sql: str):
    """Static fence for the r7 ULP failure class: every ln()/exp()/
    log() in an oracle must sit inside an enclosing round(...) — either
    the 9-dp finish quantization or the nano-nat
    ``CAST(round(ln(x) * 1e9) AS BIGINT)`` idiom. Raw transcendental
    finishes compared as DOUBLE diverge in the last ULP between
    Spark's JVM and other engines' libm (ev_ab_sequential /
    ts_spectral_slope, r7).

    Returns a list of (func, char_offset) violations.
    """
    import re

    s = re.sub(r"'[^']*'", "''", sql.lower())
    viol = []
    stack = []
    ident = re.compile(r"[a-z_][a-z0-9_]*$")
    for i, ch in enumerate(s):
        if ch == "(":
            head = s[:i].rstrip()
            m = ident.search(head)
            fname = m.group(0) if m and head.endswith(m.group(0)) else ""
            if fname in _TRANSCENDENTALS and "round" not in stack:
                viol.append((fname, i))
            stack.append(fname)
        elif ch == ")" and stack:
            stack.pop()
    return viol


def assert_no_nulls(con, sql: str, name: str = "") -> None:
    """Assert the oracle emits no NULL values in any output column.

    Compared outputs are NULL-free by policy: the driver's value-hash
    behavior on NULL is unverified, and NULL doubles crashed the r7
    comparator sort. Operators signal "undefined" with documented
    sentinels (0.0 / -1.0), never NULL.
    """
    rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    pred = " OR ".join(f'"{c}" IS NULL' for c in rel.columns)
    if not pred:
        return
    n = con.execute(
        f"SELECT COUNT(*) FROM ({sql}) WHERE {pred}"
    ).fetchone()[0]
    assert n == 0, (
        f"{name}: oracle emits {n} row(s) with NULL values; compared "
        f"outputs must be NULL-free — use a documented sentinel "
        f"(0e0 / -1e0) in both engines instead"
    )


def compare(spark_df, con, sql: str, name: str = "") -> None:
    """Assert spark result == duckdb result (order-insensitive)."""
    assert_oracle_types(con, sql, name)
    assert_no_nulls(con, sql, name)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    n_null = sum(1 for r in spark_rows if any(v is None for v in r))
    assert n_null == 0, (
        f"{name}: Spark output has {n_null} row(s) with NULL values; "
        f"compared outputs must be NULL-free (sentinel policy)"
    )
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
