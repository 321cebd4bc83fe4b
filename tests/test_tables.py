"""Regression tests for derived-view dtype robustness.

Round-3 incident: the driver regenerated ``events.parquet`` with ``ts``
as TIMESTAMP(MICROS) (previously TIMESTAMP(NANOS)), and
``chan_events_view``'s unconditional ``ts div 1000`` broke 7 driver
CORRECTNESS rows plus the whole bench. The view must produce identical
epoch-µs output for BOTH physical parquet timestamp encodings.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pennsieve_streaming_spark import tables as TBL

BASE_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in epoch-µs
N = 20


def _write_events(dirpath: str, unit: str) -> None:
    ts_us = [BASE_US + i * 137_000 for i in range(N)]
    if unit == "ns":
        vals = [t * 1000 for t in ts_us]
    elif unit == "us":
        vals = ts_us
    else:
        raise ValueError(unit)
    tbl = pa.table(
        {
            "event_id": pa.array(range(N), pa.int64()),
            "ts": pa.array(vals, pa.timestamp(unit)),
            "user_id": pa.array([i % 3 for i in range(N)], pa.int64()),
            "event_type": pa.array(["alpha" if i % 2 else "beta" for i in range(N)]),
            "value": pa.array([float(i) * 1.5 for i in range(N)], pa.float64()),
            "props": pa.array(["{}"] * N),
        }
    )
    # version 2.6 keeps TIMESTAMP(NANOS) as nanos instead of coercing
    pq.write_table(tbl, os.path.join(dirpath, "events.parquet"), version="2.6")


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_chan_events_view_epoch_us_both_encodings(spark, tmp_path, unit):
    d = str(tmp_path / unit)
    os.makedirs(d)
    _write_events(d, unit)
    rows = (
        TBL.chan_events_view(spark, d)
        .orderBy("ts")
        .collect()
    )
    assert len(rows) == N
    assert [r.ts for r in rows] == [BASE_US + i * 137_000 for i in range(N)]
    assert rows[0].channel in ("alpha", "beta")
    # schema contract: ts is LONG epoch-µs regardless of input encoding
    df = TBL.chan_events_view(spark, d)
    assert dict(df.dtypes)["ts"] == "bigint"


def test_epoch_micros_col_rejects_bad_type(spark):
    df = spark.createDataFrame([("x",)], ["ts"])
    with pytest.raises(TypeError):
        TBL.epoch_micros_col(df, "ts")


def test_chan_events_view_matches_duckdb_oracle(spark):
    """DuckDB epoch_us(ts) on the real sf0.001 events table must equal the
    Spark view exactly (this is the driver's oracle contract)."""
    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(path):
        pytest.skip("no testdata")
    spark_rows = sorted(
        (r.channel, r.ts, r.value)
        for r in TBL.chan_events_view(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    oracle_rows = sorted(
        con.execute(
            "SELECT event_type AS channel, epoch_us(ts) AS ts, value "
            f"FROM read_parquet('{path}')"
        ).fetchall()
    )
    assert spark_rows == oracle_rows
