"""Streaming corpus curation (streaming/corpus.py): stateless gates,
exact dedup across micro-batches, foreachBatch near-dup fold."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pennsieve_streaming_spark.streaming.corpus import (  # noqa: E402
    DOCUMENTS_SCHEMA,
    curate_document_stream,
    exact_dedup_stream,
    read_document_stream,
    start_neardup_dedup_stream,
)

SHARD1 = [
    (0, "the quick brown fox jumps over the lazy dog again and again today", "en", "s0"),
    (1, "spam spam spam spam spam spam spam spam spam spam", "en", "s0"),
    (2, "a completely different and unique document about spark plans", "en", "s1"),
    (3, "1 2 3 4 5 6 7 8", "en", "s1"),  # low quality (no alpha)
]
SHARD2 = [
    (10, "the quick brown fox jumps over the lazy dog again and again today", "en", "s0"),  # exact dup of 0
    (11, "another unique document discussing the catalyst optimizer deeply", "en", "s1"),
    (12, "mail me at bob@example.com for details about the offer please", "en", "s2"),
]


def _write_shard(spark, rows, path):
    spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture()
def shard_dir(spark, tmp_path):
    d = str(tmp_path / "shards")
    _write_shard(spark, SHARD1, d)
    return d


def _drain(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_curate_stream_matches_batch(spark, shard_dir):
    stream = curate_document_stream(
        read_document_stream(spark, shard_dir), quality_min=0.2
    )
    _drain(stream, "curated")
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM curated").collect())
    )
    batch = sorted(
        map(
            tuple,
            curate_document_stream(
                spark.read.schema(DOCUMENTS_SCHEMA).parquet(shard_dir),
                quality_min=0.2,
            ).collect(),
        )
    )
    assert got == batch
    ids = {r[0] for r in got}
    assert 1 not in ids          # repetition gate
    assert 3 not in ids          # quality gate
    assert {0, 2} <= ids


def test_curate_stream_scrubs_pii(spark, tmp_path):
    d = str(tmp_path / "pii")
    _write_shard(spark, SHARD2, d)
    stream = curate_document_stream(
        read_document_stream(spark, d), quality_min=0.0
    )
    _drain(stream, "curated_pii")
    row = spark.sql(
        "SELECT * FROM curated_pii WHERE doc_id = 12"
    ).collect()[0]
    assert "<EMAIL>" in row["clean_text"]
    assert row["n_redactions"] == 1


def test_exact_dedup_stream(spark, shard_dir):
    # duplicate of doc 0 arrives in a LATER micro-batch (new file)
    _write_shard(spark, SHARD2, shard_dir)
    stream = exact_dedup_stream(
        read_document_stream(spark, shard_dir, max_files_per_trigger=1)
    )
    _drain(stream, "deduped")
    rows = spark.sql("SELECT doc_id, text FROM deduped").collect()
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))  # one row per distinct text
    ids = {r["doc_id"] for r in rows}
    # exactly one of the exact-dup pair (0, 10) survives
    assert len(ids & {0, 10}) == 1
    assert {1, 2, 3, 11, 12} <= ids


def test_exact_dedup_stream_null_text_not_collapsed(spark, tmp_path):
    """Distinct NULL-text rows must all survive (md5(NULL) is NULL and
    NULL dropDuplicates keys compare equal — guarded by a per-doc
    digest)."""
    d = str(tmp_path / "nulls")
    rows = [(0, None, "en", "s"), (1, None, "en", "s"), (2, "real text", "en", "s")]
    _write_shard(spark, rows, d)
    _drain(exact_dedup_stream(read_document_stream(spark, d)), "null_dedup")
    ids = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM null_dedup").collect()}
    assert ids == {0, 1, 2}


def test_neardup_dedup_stream(spark, tmp_path):
    shards = str(tmp_path / "nd_shards")
    out = str(tmp_path / "nd_out")
    store = str(tmp_path / "nd_store")
    ckpt = str(tmp_path / "nd_ckpt")

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    _write_shard(spark, [(0, base, "en", "s0"),
                         (1, "totally unrelated words about streaming joins and state", "en", "s0")], shards)
    q = start_neardup_dedup_stream(
        read_document_stream(spark, shards, max_files_per_trigger=1),
        out, store, ckpt,
    )
    q.awaitTermination(120)

    # batch 2: a near-copy of doc 0 (same shingles) + a fresh doc
    _write_shard(spark, [(10, base, "en", "s1"),
                         (11, "yet another fresh document with brand new content entirely", "en", "s1")], shards)
    q = start_neardup_dedup_stream(
        read_document_stream(spark, shards, max_files_per_trigger=1),
        out, store, ckpt,
    )
    q.awaitTermination(120)

    ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 0 in ids and 1 in ids and 11 in ids
    assert 10 not in ids  # near-dup of history doc 0 dropped

    # the store holds band keys only for survivors
    store_ids = {r["doc_id"] for r in spark.read.parquet(store).collect()}
    assert store_ids == {0, 1, 11}


def test_neardup_replay_is_idempotent(spark, tmp_path):
    """Re-running the same batch (same batch_id via fresh checkpoint
    on the same input) must not duplicate output or self-collide."""
    shards = str(tmp_path / "rp_shards")
    out = str(tmp_path / "rp_out")
    store = str(tmp_path / "rp_store")

    _write_shard(spark, SHARD1, shards)
    for attempt in range(2):  # second run replays batch 0 from scratch
        ckpt = str(tmp_path / f"rp_ckpt{attempt}")
        q = start_neardup_dedup_stream(
            read_document_stream(spark, shards),
            out, store, ckpt,
        )
        q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    assert len(rows) == len({r["doc_id"] for r in rows}) == 4
