"""Bucketed persistence for shuffle-free co-located execution.

The single biggest lever at 100 TB is not running a shuffle at all.
Spark's bucketed tables persist data pre-hash-partitioned on a key
(with optional in-file sort order); any later join or aggregation on
that key reads the matching buckets directly and Catalyst drops the
Exchange — the classic "pay the shuffle once at ingest, never again"
trade every serving deployment of this engine should take:

- samples bucketed by ``channel``: every per-channel window operator
  (downsample ranking, gap sessionization, rolling stats) and every
  channel-equi-join (montage!) runs Exchange-free;
- documents bucketed by ``doc_id`` ranges keep dedup-verify joins
  bucket-local; band tables bucketed on (band, band_key) make the LSH
  candidate join a bucket-local hash join (the plan NOTES_r4 §5
  describes).

``tests/test_bucketing.py`` plan-asserts both claims: a
bucketed-by-channel self-join and a bucketed groupBy plan with ZERO
shuffle Exchanges.

Bucket-count sizing: buckets are fixed at write time; pick
``n_buckets`` ≈ total-size / target-task-size (128–512 MB) at the
LARGEST anticipated scale — small scans just read fewer rows per
bucket, while repartitioning an under-bucketed petabyte table costs a
full rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally in-file sorted)
    table. ``path`` pins an external location (tests use tmp dirs);
    default is the session warehouse."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        int(n_buckets), bucket_col
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the same files would NOT carry
    the partitioning and would re-shuffle)."""
    return spark.table(table)
