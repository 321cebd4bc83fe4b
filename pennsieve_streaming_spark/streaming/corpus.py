"""Structured Streaming corpus curation: the incremental flavor of the
batch pipeline in ``llm/text.py`` / ``llm/curation.py`` / ``llm/dedup.py``.

A 100 TB pretraining corpus is not rebuilt from scratch — new crawl
shards arrive continuously. Three streaming shapes cover the pipeline:

1. **Stateless curation** (PII scrub, quality, repetition, lang gates)
   is pure projection + filter, so the batch transforms apply to a
   streaming DataFrame unchanged — same code, same oracle-verified
   expressions (``with_pii_scrub``, ``with_quality``,
   ``dup_ratio_expr``).
2. **Exact dedup across the stream** is ``dropDuplicates`` on the
   16-byte content digest: state is one digest per *distinct* document
   (bounded by corpus cardinality, not stream length); with an
   event-time column, ``withWatermark`` bounds it further.
3. **Near-dup dedup against history** can't be a pure stream-stream
   join (the "history" side is unbounded and self-referential), so it
   runs as the standard ``foreachBatch`` fold: each micro-batch is
   MinHash-banded (``llm/dedup.py``), joined against the accumulated
   band-key store, survivors are appended to the sink and their keys
   to the store. Batch-id-named subdirectories make replays
   idempotent (a re-run of batch N overwrites batch N's own output
   and filters its own keys out of the history read).

Store compaction at scale follows the rollup pattern
(``streaming/rollup_maintenance.py``): fold batch subdirs into one
sorted key table offline; at 100 TB the store is a bucketed table on
(band, band_key) so the per-batch join is a bucket-local hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm.curation import (
    dup_ratio_expr,
    with_pii_scrub,
)
from pennsieve_streaming_spark.llm.dedup import (
    lsh_band_keys,
    minhash_wide,
    shingles,
)
from pennsieve_streaming_spark.llm.text import TOKS, with_quality

DOCUMENTS_SCHEMA = "doc_id long, text string, lang string, source string"


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-based streaming source of document shards (stand-in for a
    Kafka/queue feed; swap ``format``). ``maxFilesPerTrigger`` is the
    ingest throttle — the same backpressure knob as the time-series
    ingest path (reference T4)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def curate_document_stream(
    documents: DataFrame,
    quality_min: float = 0.3,
    max_dup3: float = 0.2,
    langs: list[str] | None = None,
) -> DataFrame:
    """Stateless curation gates as ONE streaming projection: PII scrub,
    quality floor, repetition ceiling, optional language allow-list.

    Works identically on a batch DataFrame (the transforms are pure
    projections/filters) — tests assert stream == batch on the same
    shards.

    Note: Catalyst inlines the aliased stat expressions into the gate
    predicate (see NOTES_r3 on the alias-inlining trap), so quality
    and dup_3gram_ratio are evaluated ~2× per row here. A stream can't
    take the ``persist`` barrier ``curate_corpus`` uses; 2× on a
    per-micro-batch narrow map is the accepted cost.

    Output: (doc_id, lang, source, quality, dup_3gram_ratio,
    n_redactions, clean_text) for surviving documents. The quality and
    repetition stats describe the PRE-scrub text (scoring the scrubbed
    text would let repeated '<EMAIL>' placeholders inflate dup ratios
    and count placeholder tokens as content); clean_text is what flows
    downstream.
    """
    out = with_quality(with_pii_scrub(documents))
    out = out.withColumn("toks", F.expr(TOKS)).withColumn(
        "dup_3gram_ratio", F.expr(dup_ratio_expr(3))
    )
    cond = (F.col("quality") >= quality_min) & (
        F.col("dup_3gram_ratio") <= max_dup3
    )
    if langs is not None:
        cond = cond & F.col("lang").isin(list(langs))
    return out.where(cond).select(
        "doc_id",
        "lang",
        "source",
        "quality",
        "dup_3gram_ratio",
        "n_redactions",
        "clean_text",
    )


def exact_dedup_stream(
    documents: DataFrame, watermark: tuple[str, str] | None = None
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each content digest
    wins, later duplicates are dropped across micro-batches.

    State is one 16-byte digest per distinct document. With
    ``watermark=(ts_col, delay)`` the digest state ages out via
    ``dropDuplicatesWithinWatermark`` — the bounded-state production
    shape when duplicates arrive close in time.

    NULL text never dedups: md5(NULL) is NULL and dropDuplicates
    treats NULL keys as equal, which would collapse every bad crawl
    record into one survivor — so NULL-text rows get a per-doc digest
    and all pass through.
    """
    with_digest = documents.withColumn(
        "digest",
        F.expr("coalesce(md5(text), concat('null:', doc_id))"),
    )
    if watermark is not None:
        col, delay = watermark
        return with_digest.withWatermark(col, delay).dropDuplicatesWithinWatermark(
            ["digest"]
        )
    return with_digest.dropDuplicates(["digest"])


def _batch_band_keys(
    batch: DataFrame, n_hashes: int, rows_per_band: int
) -> DataFrame:
    """(doc_id, band, band_key) for one micro-batch."""
    return lsh_band_keys(
        minhash_wide(shingles(batch), n_hashes=n_hashes),
        rows_per_band=rows_per_band,
    )


def start_neardup_dedup_stream(
    documents: DataFrame,
    output_path: str,
    store_path: str,
    checkpoint_path: str,
    n_hashes: int = 16,
    rows_per_band: int = 4,
):
    """Incremental MinHash-LSH near-dup dedup: each micro-batch drops
    documents that collide (share any LSH band key) with EITHER the
    accumulated history store or an earlier doc_id in the same batch,
    then appends survivors to ``output_path`` and their band keys to
    ``store_path``.

    Exactly-once: outputs land in ``batch_id=N`` subdirectories written
    with overwrite, so a replayed batch rewrites its own output instead
    of duplicating it, and the history read excludes the current
    batch_id (a half-written replay can't make the batch collide with
    itself).

    Precision: a band collision drops the document WITHOUT the exact
    Jaccard verify the batch pipeline runs (verification would need
    historical shingle sets in the store, ~60 hashes/doc instead of
    ``n_hashes/rows_per_band`` band keys). False-drop rate is set by
    ``rows_per_band`` — at the 16/4 default a 1M-doc probe measured
    0.04% false drops alongside 100% recall of planted duplicates
    (NOTES_r3). Raise ``rows_per_band`` to trade recall for precision,
    or store shingles and verify in the fold if false drops matter.

    Returns the StreamingQuery.
    """

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        keys = None
        try:
            keys = _batch_band_keys(
                batch_df, n_hashes, rows_per_band
            ).persist()

            # Existence check, not a blanket try/except: a transient
            # read failure (corrupt footer, storage blip) must FAIL the
            # batch so the checkpoint retries it — swallowing it would
            # silently skip the history join and append duplicates.
            jvm_path = spark._jvm.org.apache.hadoop.fs.Path(store_path)
            fs = jvm_path.getFileSystem(
                spark._jsc.hadoopConfiguration()
            )
            hist_hit = None
            if fs.exists(jvm_path):
                hist = spark.read.parquet(store_path).where(
                    F.col("batch_id") < F.lit(batch_id)
                )
                hist_hit = (
                    keys.join(hist, ["band", "band_key"], "leftsemi")
                    .select("doc_id")
                    .distinct()
                )

            # within-batch: smallest doc_id in a colliding bucket wins
            first = keys.groupBy("band", "band_key").agg(
                F.min("doc_id").alias("keep_id")
            )
            intra_hit = (
                keys.join(first, ["band", "band_key"])
                .where(F.col("doc_id") != F.col("keep_id"))
                .select("doc_id")
                .distinct()
            )
            drop = (
                intra_hit if hist_hit is None
                else intra_hit.unionByName(hist_hit).distinct()
            )
            survivors = batch_df.join(drop, "doc_id", "left_anti")

            survivors.write.mode("overwrite").parquet(
                f"{output_path}/batch_id={batch_id}"
            )
            # batch_id is encoded ONLY in the directory name (hive
            # partition discovery supplies the column on read; a data
            # column with the same name would conflict with it)
            surv_keys = keys.join(
                survivors.select("doc_id"), "doc_id", "leftsemi"
            )
            surv_keys.write.mode("overwrite").parquet(
                f"{store_path}/batch_id={batch_id}"
            )
        finally:
            if keys is not None:
                keys.unpersist()
            batch_df.unpersist()

    return (
        documents.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
