"""Cardinality sketches: HyperLogLog and KMV (k-minimum-values).

At 100 TB, exact COUNT(DISTINCT) of a high-cardinality column (URLs,
shingles, n-grams) shuffles every distinct value; a sketch reduces the
shuffle to a constant-size state. Spark's built-in
``approx_count_distinct`` is an opaque HLL++ whose result cannot be
replayed by another engine, so these operators implement the sketches
from public literature (Flajolet et al. 2007 HyperLogLog; Bar-Yossef
et al. 2002 KMV) with the repo's engine-portable md5 hash and
order-independent or explicitly-ordered arithmetic, making the
estimate bit-replayable by the DuckDB oracle:

- every hash is the 60-bit md5 prefix (``md5_hash64_expr``);
- HLL register maxima are integer aggregates (order-free);
- the HLL harmonic sum folds registers in ascending bucket order with
  each term an EXACT power of two (``1.0 / (1 << rho)``), so the float
  sum has a fixed operand order;
- ln() in the small-range correction is quantized to 9 decimals (JVM
  vs libm last-ulp divergence);
- KMV needs no floats at all until the final single division.

Both sketches aggregate to ONE row; the shuffle carries register
states (HLL: <= 2^p rows pre-agg with map-side partial max; KMV: the
global top-k of hashes via a single min-k aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm.hashing import md5_hash64_expr

HASH_BITS = 60  # md5_hash64_* yields the first 15 hex digits = 60 bits


def _alpha(m: int) -> float:
    """Standard HLL bias constant, rounded so both engines inline the
    identical literal."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return round(0.7213 / (1 + 1.079 / m), 9)


def hll_distinct(
    df: DataFrame, col_expr: str, p: int = 8
) -> DataFrame:
    """HyperLogLog distinct-count estimate of ``col_expr``.

    Output (one row): (m, zero_buckets, raw_estimate, estimate).
    ``estimate`` applies the standard small-range linear-counting
    correction (m * ln(m / zero_buckets) when raw <= 2.5m and empty
    buckets exist).
    """
    return hll_estimate(hll_registers(df, col_expr, p), p)


def kmv_distinct(
    df: DataFrame, col_expr: str, k: int = 64
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimate: keep the k
    smallest distinct hashes; estimate = (k-1) * 2^60 / kth_min.

    Pure integer state until one final division — no float
    accumulation anywhere, so the estimate is trivially exact to
    replay. Output (one row): (k, kth_min, n_seen, estimate); when
    fewer than k distinct hashes exist the exact distinct count is
    returned (n_seen < k <=> estimate is exact).
    """
    h = md5_hash64_expr(col_expr)
    hashes = (
        df.select(F.expr(h).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    # Global min-k via orderBy+limit — Spark plans this as
    # TakeOrderedAndProject: each partition keeps its k smallest, the
    # driver merges k-sized heaps. The preceding distinct() is the
    # scale cost (it shuffles one 8-byte row per distinct value —
    # ~1000x smaller than the raw column; when even that is too much,
    # HLL above is the constant-state alternative).
    mins = (
        hashes.orderBy("h")
        .limit(k)
        .agg(F.expr("sort_array(collect_list(h)) AS mins"))
    )
    two60 = 1 << HASH_BITS
    # element_at index 0 is an ANSI error — guard the empty-input case
    # (n_seen = 0 -> kth_min NULL, estimate 0.0)
    return mins.select(
        F.lit(k).cast("long").alias("k"),
        F.expr("CAST(size(mins) AS BIGINT)").alias("n_seen"),
        F.expr(
            "CASE WHEN size(mins) = 0 THEN CAST(NULL AS BIGINT) "
            "ELSE CAST(element_at(mins, CAST(size(mins) AS INT)) AS BIGINT) END"
        ).alias("kth_min"),
        F.expr(
            f"CASE WHEN size(mins) = 0 THEN CAST(0 AS DOUBLE) "
            f"WHEN size(mins) < {k} THEN CAST(size(mins) AS DOUBLE) "
            f"ELSE round(CAST({k} - 1 AS DOUBLE) * {two60} "
            f"/ element_at(mins, CAST(size(mins) AS INT)), 9) END"
        ).alias("estimate"),
    )


def hll_registers(df: DataFrame, col_expr: str, p: int = 8) -> DataFrame:
    """The HLL sketch STATE: (bucket, rho) register maxima. Registers
    are the mergeable form — per-shard / per-day sketches union with
    ``hll_merge`` and estimate exactly as if built over the combined
    input, which is the whole point of HLL at fleet scale."""
    m = 1 << p
    wbits = HASH_BITS - p
    h = md5_hash64_expr(col_expr)
    return (
        df.select(F.expr(h).alias("h"))
        .where(F.col("h").isNotNull())
        .select(
            (F.col("h") % m).alias("bucket"),
            F.expr(f"h div {m}").alias("w"),
        )
        .select(
            "bucket",
            F.expr(
                f"CASE WHEN w = 0 THEN {wbits + 1} "
                f"ELSE {wbits} - length(bin(w)) + 1 END"
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*register_sets: DataFrame) -> DataFrame:
    """Union of HLL sketches: per-bucket max over all register sets —
    losslessly equivalent to sketching the concatenated inputs."""
    merged = register_sets[0]
    for regs in register_sets[1:]:
        merged = merged.unionByName(regs)
    return merged.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Estimate from a register table — same arithmetic as
    ``hll_distinct`` (bucket-ordered fold of exact powers of two,
    9-dp-quantized ln in the small-range correction)."""
    m = 1 << p
    alpha = _alpha(m)
    return registers.agg(
        F.expr(
            f"""
            named_struct(
              'zero_buckets', CAST({m} - count(1) AS BIGINT),
              'z', aggregate(
                     transform(sort_array(collect_list(struct(bucket, rho))),
                               s -> CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), s.rho) AS DOUBLE)),
                     CAST({m} - count(1) AS DOUBLE), (a, x) -> a + x)
            ) AS st
            """
        )
    ).select(
        F.lit(m).cast("long").alias("m"),
        F.col("st.zero_buckets").alias("zero_buckets"),
        F.expr(
            f"round(CAST({alpha!r} AS DOUBLE) * {m} * {m} / st.z, 9)"
        ).alias("raw_estimate"),
        F.expr(
            f"""
            round(CASE WHEN CAST({alpha!r} AS DOUBLE) * {m} * {m} / st.z <= 2.5 * {m}
                        AND st.zero_buckets > 0
                       THEN {m} * round(ln(CAST({m} AS DOUBLE) / st.zero_buckets), 9)
                       ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m} / st.z END, 9)
            """
        ).alias("estimate"),
    )


def hll_distinct_by(
    df: DataFrame, group_col: str, col_expr: str, p: int = 8
) -> DataFrame:
    """Grouped HLL: one distinct-count estimate per ``group_col``
    value (distinct URLs per domain, distinct shingles per source...)
    — the GROUP BY form of ``hll_distinct``, sharing its register
    arithmetic and determinism contract.

    Output: (group, m, zero_buckets, raw_estimate, estimate), one row
    per group. Shuffle carries <= |groups| x 2^p register rows with
    map-side partial max — constant per group regardless of input
    size.
    """
    m = 1 << p
    wbits = HASH_BITS - p
    h = md5_hash64_expr(col_expr)
    regs = (
        df.select(F.col(group_col).alias("grp"), F.expr(h).alias("h"))
        .where(F.col("h").isNotNull())
        .select(
            "grp",
            (F.col("h") % m).alias("bucket"),
            F.expr(f"h div {m}").alias("w"),
        )
        .select(
            "grp",
            "bucket",
            F.expr(
                f"CASE WHEN w = 0 THEN {wbits + 1} "
                f"ELSE {wbits} - length(bin(w)) + 1 END"
            ).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    alpha = _alpha(m)
    est = f"CAST({alpha!r} AS DOUBLE) * {m} * {m} / z"
    return (
        regs.groupBy("grp")
        .agg(
            F.expr(
                f"""
                named_struct(
                  'zero_buckets', CAST({m} - count(1) AS BIGINT),
                  'z', aggregate(
                         transform(sort_array(collect_list(struct(bucket, rho))),
                                   s -> CAST(1 AS DOUBLE) / CAST(shiftleft(CAST(1 AS BIGINT), s.rho) AS DOUBLE)),
                         CAST({m} - count(1) AS DOUBLE), (a, x) -> a + x)
                ) AS st
                """
            )
        )
        .select(
            F.col("grp").alias(group_col),
            F.lit(m).cast("long").alias("m"),
            F.col("st.zero_buckets").alias("zero_buckets"),
            F.expr(f"round({est.replace('z', 'st.z')}, 9)").alias("raw_estimate"),
            F.expr(
                f"""
                round(CASE WHEN {est.replace('z', 'st.z')} <= 2.5 * {m}
                            AND st.zero_buckets > 0
                           THEN {m} * round(ln(CAST({m} AS DOUBLE) / st.zero_buckets), 9)
                           ELSE {est.replace('z', 'st.z')} END, 9)
                """
            ).alias("estimate"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — heavy hitters
# ---------------------------------------------------------------------------
#
# At 100 TB an exact token-frequency table shuffles |vocab| rows; a CMS
# caps the shuffled state at d×w integer counters (map-side partial
# sums make each task emit at most d×w rows), and heavy-hitter
# candidates are then estimated by looking their buckets up in the
# broadcast counter table. All state is integer counts under
# deterministic hashes — the whole sketch replays bit-exactly in SQL.

from pennsieve_streaming_spark.llm.hashing import P_MINHASH as CMS_P  # noqa: E402


def _cms_bucket_exprs(item: str, depth: int, width: int) -> list[str]:
    """SQL text of the d bucket indices for ``item`` (a column/expr
    producing the md5-prefix hash input string): independent
    permutations of the shared 60-bit hash, each reduced mod width."""
    from pennsieve_streaming_spark.llm.hashing import (
        md5_hash64_expr,
        minhash_perm_constants,
    )

    h = md5_hash64_expr(item)
    return [
        f"(({a} * ({h}) + {b}) % {CMS_P}) % {width}"
        for a, b in minhash_perm_constants(depth)
    ]


def cms_counters(
    df: DataFrame, col_expr: str, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Build the d×w counter table over ``col_expr`` occurrences.

    Output: (row, bucket, cnt) for non-empty counters — at most
    depth×width rows no matter the input size. Plan: one projection to
    d (row, bucket) pairs per input row (an inline array explode, no
    join) + one partial-agg groupBy whose shuffle is bounded by d×w.
    """
    pairs = ", ".join(
        f"named_struct('row', {j}, 'bucket', {b})"
        for j, b in enumerate(_cms_bucket_exprs(col_expr, depth, width))
    )
    return (
        df.select(F.explode(F.expr(f"array({pairs})")).alias("rb"))
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame, items: DataFrame, col_expr: str,
    depth: int = 3, width: int = 1024,
) -> DataFrame:
    """Point-estimate each item's frequency: min over the d counters it
    hashes to (the classic CMS upper-bound estimate).

    ``items`` must expose ``col_expr``; output: items' ``item`` column
    + (est BIGINT). Plan: items explode to d (row, bucket) keys and
    equi-join the BROADCAST counter table (≤ d×w rows), then a min per
    item — never a shuffle of the counter side.
    """
    pairs = ", ".join(
        f"named_struct('row', {j}, 'bucket', {b})"
        for j, b in enumerate(_cms_bucket_exprs(col_expr, depth, width))
    )
    keyed = items.select(
        F.expr(col_expr).alias("item"),
        F.explode(F.expr(f"array({pairs})")).alias("rb"),
    ).select("item", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        keyed.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy("item")
        .agg(F.min("cnt").cast("long").alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame, col_expr: str, threshold: int,
    depth: int = 3, width: int = 1024,
) -> DataFrame:
    """Heavy hitters via CMS: distinct values whose estimated count
    meets ``threshold``. CMS estimates never under-count, so every true
    heavy hitter survives (possible false positives by design —
    callers verify with one exact pass over the small candidate set if
    they need exactness).

    Output: (item, est), est >= threshold.
    """
    counters = cms_counters(df, col_expr, depth, width)
    distinct_items = df.select(F.expr(col_expr).alias("it")).where(
        F.col("it").isNotNull() & (F.length("it") > 0)
    ).distinct()
    est = cms_estimate(counters, distinct_items, "it", depth, width)
    return est.filter(F.col("est") >= int(threshold)).select(
        F.col("item"), F.col("est")
    )


def kmv_distinct_by(
    df: DataFrame, group_col: str, col_expr: str, k: int = 64,
    n_salts: int = 32,
) -> DataFrame:
    """Grouped KMV: one k-minimum-values distinct estimate per
    ``group_col`` value — the GROUP BY form of ``kmv_distinct``, same
    integer-only estimate arithmetic.

    Output: (group, k, n_seen, kth_min, estimate) — one row per group;
    groups with fewer than k distinct hashes report their exact count
    (kth_min = -1 sentinel keeps the row NULL-free).

    Plan (100 TB): distinct (group, hash) pairs shuffle once (8-byte
    hash per distinct value); per-group min-k then runs in TWO bounded
    stages — min-k within (group, salt) via sorted-slice aggregation
    (each state ≤ k values after the slice), then a merge of the
    ≤ n_salts × k survivors per group. No global sort, no one-task-
    per-group window over raw values.
    """
    h = md5_hash64_expr(col_expr)
    hashes = (
        df.select(F.col(group_col).alias("grp"), F.expr(h).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    kk = int(k)
    stage1 = (
        hashes.withColumn("_salt", F.col("h") % int(n_salts))
        .groupBy("grp", "_salt")
        .agg(F.expr(f"slice(sort_array(collect_list(h)), 1, {kk}) AS mins"))
    )
    merged = (
        stage1.select("grp", F.explode("mins").alias("h"))
        .groupBy("grp")
        .agg(F.expr(f"slice(sort_array(collect_list(h)), 1, {kk}) AS mins"))
    )
    two60 = 1 << HASH_BITS
    return merged.select(
        F.col("grp").alias("grp"),
        F.lit(kk).cast("long").alias("k"),
        F.expr("CAST(size(mins) AS BIGINT)").alias("n_seen"),
        F.expr(
            f"CASE WHEN size(mins) < {kk} THEN CAST(-1 AS BIGINT) "
            "ELSE CAST(element_at(mins, CAST(size(mins) AS INT)) AS BIGINT) END"
        ).alias("kth_min"),
        F.expr(
            f"CASE WHEN size(mins) = 0 THEN CAST(0 AS DOUBLE) "
            f"WHEN size(mins) < {kk} THEN CAST(size(mins) AS DOUBLE) "
            f"ELSE round(CAST({kk} - 1 AS DOUBLE) * {two60} "
            f"/ element_at(mins, CAST(size(mins) AS INT)), 9) END"
        ).alias("estimate"),
    )
