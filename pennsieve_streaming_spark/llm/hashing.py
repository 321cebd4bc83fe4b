"""Engine-portable deterministic hashing.

All dedup/fingerprint operators need hash functions that (a) run
JVM-side in Spark (no Python UDF in the hot path) and (b) can be
reproduced exactly by the DuckDB oracle. Built-ins like murmur3
(`F.hash`) differ across engines, so we use a classic polynomial
rolling hash over character codes:

    h(s) = fold(acc = (acc * 31 + codepoint) mod P, acc0 = 0)

expressed with `aggregate(transform(sequence(...)))` in Spark SQL and
`list_reduce(list_transform(generate_series(...)))` in DuckDB — both
sequential left folds, hence bit-identical.

At production scale the same operators can swap in `F.xxhash64`
(faster, JVM-native) — the oracle-portable variant exists so the
correctness gate can verify the *pipeline* semantics.
"""

from __future__ import annotations

P_POLY = 1_000_000_007       # shingle/fingerprint hash modulus
P_MINHASH = 2_147_483_647    # Mersenne prime 2^31-1 for permutations


def poly_hash_expr(col: str, p: int = P_POLY) -> str:
    """Spark SQL expression: polynomial hash of a string column."""
    return (
        f"CASE WHEN {col} IS NULL OR length({col}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE aggregate("
        f"transform(sequence(1, length({col})), i -> CAST(ascii(substring({col}, i, 1)) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, c) -> (acc * 31 + c) % {p}) END"
    )


def poly_hash_duck(col: str, p: int = P_POLY) -> str:
    """DuckDB SQL expression computing the identical polynomial hash."""
    return (
        f"CASE WHEN {col} IS NULL OR length({col}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE list_reduce("
        f"list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, length({col})), "
        f"i -> CAST(ascii(substring({col}, CAST(i AS INT), 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {p}) END"
    )


def md5_hash64_expr(col: str) -> str:
    """Spark SQL: 60-bit integer hash = first 15 hex digits of md5.

    md5 is whole-stage-codegen'd JVM-side (fast); `conv` parses the hex
    prefix. Used for shingle hashing in the hot dedup path — the
    polynomial fold (a higher-order function, interpreted) stays for
    the rolling-fingerprint operator where one fold per document is
    cheap.
    """
    return f"CAST(conv(substring(md5({col}), 1, 15), 16, 10) AS BIGINT)"


def md5_hash64_duck(col: str) -> str:
    """DuckDB SQL computing the identical md5-prefix hash: a 15-char
    fold over hex digits (cheap — fixed length)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(1, 15), "
        f"i -> CAST(strpos('0123456789abcdef', substring(md5({col}), CAST(i AS INT), 1)) - 1 AS BIGINT))), "
        f"(acc, d) -> acc * 16 + d)"
    )


def minhash_perm_constants(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) constants for the j-th minhash permutation
    ``(a*h + b) mod P_MINHASH``; a odd so the map is well-mixing."""
    return [(2 * j + 1, 7919 * j + 13) for j in range(n_hashes)]
