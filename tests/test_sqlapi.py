"""SQL surface (sqlapi.register_views): spark.sql over the registered
views must agree with the DataFrame API, and pruning must survive the
view hop."""

from __future__ import annotations

from pyspark.sql import functions as F

from pennsieve_streaming_spark import tables as TBL
from pennsieve_streaming_spark.sqlapi import register_views

SF = "/root/testdata/sf0.001"


def test_sql_matches_dataframe_api(spark):
    names = register_views(spark, SF, prefix="t1_")
    assert "t1_samples" in names and "t1_documents" in names
    got = spark.sql(
        """
        SELECT s.channel, COUNT(*) AS n, MIN(s.value) AS lo
        FROM t1_samples s JOIN t1_channels c ON s.channel = c.channel
        GROUP BY s.channel ORDER BY s.channel
        """
    ).collect()
    df = TBL.samples_view(spark, SF)
    want = (
        df.join(TBL.channels_view(spark, SF), "channel")
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n"), F.min("value").alias("lo"))
        .orderBy("channel")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pruning_pushes_through_views(spark):
    register_views(spark, SF, prefix="t2_")
    q = spark.sql("SELECT doc_id FROM t2_documents WHERE doc_id < 5")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # column pruning: the scan must read only doc_id
    assert "ReadSchema: struct<doc_id:bigint>" in plan
    # predicate pushdown reaches the parquet scan
    assert "LessThan(doc_id,5)" in plan or "doc_id" in plan.split("PushedFilters: [")[1].split("]")[0]
