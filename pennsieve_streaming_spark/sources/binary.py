"""Legacy binary segment ingestion (S3/S4/F1).

The reference's data plane is gzipped flat files of 8-byte big-endian
doubles (one file = one channel segment;
query/TimeSeriesQueryUtils.scala:40-59, query/WsClient.scala:196-203),
and 9-byte event records (8-byte BE long timestamp + 1 ignored
classification byte, query/WsClient.scala:205-214).

Spark-natively these convert ONCE at ingest into the samples/events
Parquet tables: ``binaryFile`` scan -> Arrow-batched pandas decode
(np.frombuffer — vectorized, no per-record Python) -> posexplode-free
long rows. After conversion every query hits Parquet; this path exists
for migrating legacy data and for parity tests.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _maybe_gunzip(buf: bytes) -> bytes:
    if buf[:2] == b"\x1f\x8b":
        return gzip.decompress(buf)
    return buf


def decode_binary_positions(spark: SparkSession, path_glob: str) -> DataFrame:
    """Decode BE-double files to positioned rows (location, pos, value)
    — the shared kernel for continuous segments (S3) and spike-waveform
    tsblob files (G4)."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        F.element_at(F.split("path", "/"), -1).alias("location"), "content"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_loc, out_pos, out_val = [], [], []
            for loc, buf in zip(pdf["location"], pdf["content"]):
                vals = np.frombuffer(_maybe_gunzip(bytes(buf)), dtype=">f8")
                out_loc.extend([loc] * len(vals))
                out_pos.extend(range(len(vals)))
                out_val.extend(vals.astype(float))
            yield pd.DataFrame(
                {"location": out_loc, "pos": out_pos, "value": out_val}
            )

    return files.mapInPandas(
        decode, schema="location string, pos long, value double"
    )


def decode_binary_segments(
    spark: SparkSession,
    path_glob: str,
    catalog: DataFrame,
) -> DataFrame:
    """Decode legacy continuous-sample files into samples rows.

    ``catalog`` maps file location -> (channel, lo, rate): columns
    (location, channel, lo, rate) — the reference's `timeseries.ranges`
    role. Timestamps materialize as ``lo + i * round(1e6/rate)`` (W3).

    Output: (channel, ts, value).
    """
    decoded = decode_binary_positions(spark, path_glob)
    period = F.floor(F.lit(1e6) / F.col("rate") + F.lit(0.5)).cast("long")
    return (
        decoded.join(F.broadcast(catalog), "location")
        .select(
            "channel",
            (F.col("lo") + F.col("pos") * period).alias("ts"),
            "value",
        )
    )


def decode_event_files(
    spark: SparkSession, path_glob: str, catalog: DataFrame
) -> DataFrame:
    """Decode legacy 9-byte event records into events rows.

    Record: 8-byte BE long µs timestamp + 1 classification byte (kept
    here as unit_class; the reference drops it). Output:
    (channel, ts, unit_class).
    """
    files = spark.read.format("binaryFile").load(path_glob).select(
        F.element_at(F.split("path", "/"), -1).alias("location"), "content"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_loc, out_ts, out_cls = [], [], []
            for loc, buf in zip(pdf["location"], pdf["content"]):
                raw = _maybe_gunzip(bytes(buf))
                n = len(raw) // 9
                rec = np.frombuffer(raw[: n * 9], dtype=np.uint8).reshape(n, 9)
                ts = rec[:, :8].copy().view(">i8").ravel()
                out_loc.extend([loc] * n)
                out_ts.extend(ts.astype(np.int64))
                out_cls.extend(rec[:, 8].astype(np.int8))
            yield pd.DataFrame(
                {"location": out_loc, "ts": out_ts, "unit_class": out_cls}
            )

    decoded = files.mapInPandas(
        decode, schema="location string, ts long, unit_class tinyint"
    )
    return decoded.join(F.broadcast(catalog), "location").select(
        "channel", "ts", "unit_class"
    )
