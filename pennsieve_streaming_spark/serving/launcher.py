"""One-call server launcher: the reference's WebServer wiring
(server/WebServer.scala:40-110) re-expressed over the engine tables.

``build_engine(spark, sf_dir)`` derives everything a serving stack
needs from the parquet tables (samples, rates from the channel
catalog, unit events, a contiguous-span range catalog), and
``start_servers`` brings up the three transports over it:

- NDJSON TCP  (``TimeSeriesServer``)      — the protocol lane
- WebSocket   (``WebSocketTimeSeriesServer``) — GET /ts/query upgrade
- REST        (``RetrieveHttpServer``)    — retrieve/validate/health

CLI: ``python -m pennsieve_streaming_spark.serving.launcher [sf_dir]``
starts all three on ephemeral ports and prints them as JSON.
"""

from __future__ import annotations

import asyncio
from dataclasses import dataclass

from pyspark.sql import SparkSession

from pennsieve_streaming_spark import tables as TBL
from pennsieve_streaming_spark.operators.gaps import (
    contiguous_spans,
    samples_to_spans,
    time_gap_threshold,
)
from pennsieve_streaming_spark.serving.http import (
    RetrieveContext,
    RetrieveHttpServer,
)
from pennsieve_streaming_spark.serving.session import QuerySession
from pennsieve_streaming_spark.serving.transport import (
    TimeSeriesServer,
    TransportConfig,
)
from pennsieve_streaming_spark.serving.ws import WebSocketTimeSeriesServer
from pennsieve_streaming_spark.sources.catalog import spans_to_ranges


@dataclass
class Engine:
    """Everything the serving stack binds to."""

    spark: SparkSession
    samples: "DataFrame"  # noqa: F821
    rates: dict[str, float]
    context: RetrieveContext

    def session_factory(self, session_id: str, package: str | None = None):
        return QuerySession(
            self.spark, self.samples, self.rates, session_id
        )


def build_engine(spark: SparkSession, sf_dir: str) -> Engine:
    """Derive the serving surface from the parquet tables: samples +
    rates (channels catalog), unit events, and a range catalog built
    from the channels' contiguous spans (the Spark-native stand-in for
    the reference's timeseries.ranges Postgres index)."""
    samples = TBL.samples_view(spark, sf_dir).cache()
    chans = TBL.channels_view(spark, sf_dir).collect()
    rates = {r["channel"]: float(r["rate"]) for r in chans}
    events = TBL.chan_events_view(spark, sf_dir)
    rate = next(iter(rates.values()), 1.0)
    spans = contiguous_spans(
        samples_to_spans(samples), time_gap_threshold(rate)
    )
    ranges = spans_to_ranges(spans, rate).cache()
    ctx = RetrieveContext(
        samples=samples, rates=rates, events=events, ranges=ranges
    )
    return Engine(spark=spark, samples=samples, rates=rates, context=ctx)


async def start_servers(
    engine: Engine,
    host: str = "127.0.0.1",
    jwt_secret: str | None = None,
    config: TransportConfig | None = None,
) -> dict[str, object]:
    """Start all three transports; returns {'ndjson': port, 'ws': port,
    'http': port, 'servers': [...]} (ports are ephemeral)."""
    ndjson = TimeSeriesServer(
        lambda sid: engine.session_factory(sid), config=config
    )
    ws = WebSocketTimeSeriesServer(
        engine.session_factory, config=config, jwt_secret=jwt_secret
    )
    http = RetrieveHttpServer(engine.context, jwt_secret=jwt_secret)
    ports = {
        "ndjson": await ndjson.start(host),
        "ws": await ws.start(host),
        "http": await http.start(host),
    }
    return {**ports, "servers": [ndjson, ws, http]}


async def stop_servers(handles: dict[str, object]) -> None:
    for s in handles["servers"]:
        await s.stop()


def main() -> None:  # pragma: no cover - CLI convenience
    import json
    import os
    import sys

    from pennsieve_streaming_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    spark = get_spark("pss-serve")
    engine = build_engine(spark, sf_dir)

    async def run():
        handles = await start_servers(
            engine, jwt_secret=os.environ.get("PSS_JWT_SECRET")
        )
        print(json.dumps({k: handles[k] for k in ("ndjson", "ws", "http")}))
        await asyncio.Event().wait()  # serve forever

    asyncio.run(run())


if __name__ == "__main__":  # pragma: no cover
    main()
