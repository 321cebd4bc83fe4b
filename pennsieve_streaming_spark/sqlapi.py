"""SQL surface: the engine's derived tables as Spark temp views.

A user who lives in SQL (BI tools, notebooks, `spark.sql`) should not
need the Python API to reach the engine's data model. ``register_views``
publishes the derived views (samples, channels, chan_events, aligned
leads) and the raw corpus tables under one optional prefix; after that
every operator input is addressable as a plain table and arbitrary
ANSI SQL composes with the engine's DataFrames (temp views and
DataFrames share the same Catalyst catalog, so mixing them costs
nothing).

Views are lazy — registration does not scan anything; Catalyst prunes
and pushes down through them exactly as it does through the DataFrame
API (same logical plans underneath).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import SparkSession
from pyspark.sql.utils import AnalysisException

from pennsieve_streaming_spark import tables as TBL

RAW_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register the engine's derived + raw tables as temp views.
    Returns the registered view names."""
    names: list[str] = []

    def add(name: str, df) -> None:
        df.createOrReplaceTempView(prefix + name)
        names.append(prefix + name)

    add("samples", TBL.samples_view(spark, sf_dir))
    add("channels", TBL.channels_view(spark, sf_dir))
    add("chan_events", TBL.chan_events_view(spark, sf_dir))
    add("samples_aligned", TBL.samples_aligned_view(spark, sf_dir))
    for t in RAW_TABLES:
        p = posixpath.join(sf_dir, f"{t}.parquet")
        # Attempt the read rather than os.path.exists: sf_dir may be a
        # remote URI (s3://, hdfs://) that Spark can read but the local
        # filesystem cannot see. PATH_NOT_FOUND surfaces as
        # AnalysisException; missing optional tables are skipped either
        # way.
        try:
            df = spark.read.parquet(p)
            df.schema  # force resolution so a missing path raises here
        except AnalysisException:
            continue
        add(t, df)
    return names
