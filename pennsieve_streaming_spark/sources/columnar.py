"""Columnar-format corpus interchange: ORC.

ORC is the other splittable columnar format big-data estates ship
(Hive/Trino lineage); Spark carries a native vectorized ORC
reader/writer, so egress + ingest is a first-class interchange path
next to parquet and the text formats (`sources/text.py`).

Unlike the text lanes there is no quarantine column: ORC files are
self-describing and a corrupt file fails the scan loudly (callers at
100 TB opt into `spark.sql.files.ignoreCorruptFiles` operationally —
this module never drops data silently). Schema is enforced on read so
a drifted shard surfaces as a cast error, not a silently widened scan.

Scale: ORC stripes are splittable, the reader is vectorized and
supports predicate pushdown + column pruning exactly like parquet, so
downstream plans are unchanged by the interchange hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pennsieve_streaming_spark.sources.text import DOCUMENTS_SCHEMA


def write_orc_corpus(documents: DataFrame, path: str, shards: int = 0) -> None:
    """ORC egress; ``shards > 0`` repartitions for a fixed shard count
    (many mid-size files beat one giant stripe for parallel re-read)."""
    df = documents.repartition(shards) if shards else documents
    df.write.mode("overwrite").orc(path)


def read_orc_corpus(
    spark: SparkSession, path: str, schema: str = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Read an ORC corpus under the pinned documents schema."""
    return spark.read.schema(schema).orc(path)
