"""Text-format corpus ingest/egress: JSONL and CSV.

LLM corpora arrive overwhelmingly as JSONL (one JSON document per
line — the Common Crawl / HF datasets interchange shape) and
occasionally as CSV. These helpers pin the Spark reader/writer
configurations that make the round trip LOSSLESS for the documents
schema (embedded newlines, quotes, unicode), and route malformed rows
to a quarantine column instead of failing the job — at 100 TB there
is always a corrupt shard.

Plan: both formats are splittable here (JSONL by lines; CSV written
quoted + read multiLine — Spark still parallelizes by file, so shard
the write) and scan in parallel with column pruning; schema is
enforced up front (no runaway inference pass over the full corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
CORRUPT_COL = "_corrupt_record"


def write_jsonl_corpus(documents: DataFrame, path: str, shards: int = 0) -> None:
    """Write a corpus as JSONL (one JSON object per line, UTF-8).
    ``shards > 0`` repartitions for a fixed shard count."""
    df = documents.repartition(shards) if shards else documents
    df.write.mode("overwrite").json(path)


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: str = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Read a JSONL corpus with a fixed schema; malformed lines land in
    ``_corrupt_record`` (PERMISSIVE mode) for quarantine instead of
    killing the scan. Output: schema columns + _corrupt_record."""
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


CSV_NULL = "\\N"  # explicit null sentinel: disambiguates NULL vs ""


def write_csv_corpus(documents: DataFrame, path: str, shards: int = 0) -> None:
    """CSV egress with the quoting configuration that survives embedded
    newlines/quotes/commas (RFC-4180 double-quote escaping) and an
    explicit NULL sentinel so empty strings round-trip as empty
    strings, not NULLs."""
    df = documents.repartition(shards) if shards else documents
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", CSV_NULL)
        .csv(path)
    )


def read_csv_corpus(
    spark: SparkSession, path: str, schema: str = DOCUMENTS_SCHEMA
) -> DataFrame:
    """CSV ingest matching :func:`write_csv_corpus` (multiLine so
    quoted embedded newlines parse; PERMISSIVE quarantine column)."""
    return (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .option("nullValue", CSV_NULL)
        .option("emptyValue", "")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_rows) — the standard
    ingest fork: clean rows continue, corrupt rows go to a review
    sink.

    The parsed frame is cached first: Spark refuses queries that
    reference only the internal corrupt-record column of a raw
    JSON/CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and caching is
    the documented contract for inspecting quarantined rows. The cache
    also means the ingest parses each shard once for both forks.
    """
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
