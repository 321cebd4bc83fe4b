"""Pluggable channel-catalog seam: default DataFrame backend plus the
Discover-API flavor (org resolution, NotTimeSeries / DiscoverApiError
lanes) and the /discover/ts/channels HTTP route."""

from __future__ import annotations

import asyncio
import json

import pytest

from pennsieve_streaming_spark.sources.channels import (
    DataFrameChannelsQuery,
    DiscoverApiError,
    DiscoverChannelsQuery,
    JsonFileDiscoverClient,
    NotTimeSeriesError,
)


@pytest.fixture()
def channels_df(spark):
    rows = [
        ("n1", "pkg-a", "Fp1", 10.0),
        ("n2", "pkg-a", "Cz", 10.0),
        ("n3", "pkg-b", "C3", 5.0),
    ]
    return spark.createDataFrame(
        rows, "node_id string, package_id string, name string, rate double"
    )


@pytest.fixture()
def discover_file(tmp_path):
    p = tmp_path / "discover.json"
    p.write_text(json.dumps({
        "pkg-a": {"organizationId": 7, "isTimeSeries": True},
        "pkg-b": {"organizationId": 8, "isTimeSeries": True},
        "pkg-img": {"organizationId": 7, "isTimeSeries": False},
    }))
    return str(p)


def test_dataframe_backend_scopes_by_package(channels_df):
    q = DataFrameChannelsQuery(channels_df)
    assert {r.name for r in q.get_channels("pkg-a").collect()} == {"Fp1", "Cz"}
    assert {r.name for r in q.get_channels("pkg-b").collect()} == {"C3"}


def test_discover_backend_resolves_org(channels_df, discover_file):
    inner = DataFrameChannelsQuery(channels_df)
    q = DiscoverChannelsQuery(
        JsonFileDiscoverClient(discover_file), {7: inner, 8: inner}
    )
    assert {r.name for r in q.get_channels("pkg-a").collect()} == {"Fp1", "Cz"}


def test_discover_error_lanes(channels_df, discover_file):
    q = DiscoverChannelsQuery(
        JsonFileDiscoverClient(discover_file),
        {7: DataFrameChannelsQuery(channels_df)},
    )
    # non-timeseries package (extractOrganizationId guard,
    # clients/DiscoverApiClient.scala:36-47)
    with pytest.raises(NotTimeSeriesError):
        q.get_channels("pkg-img")
    # unknown package -> API error lane
    with pytest.raises(DiscoverApiError):
        q.get_channels("no-such-pkg")
    # org with no catalog -> API error lane
    with pytest.raises(DiscoverApiError):
        q.get_channels("pkg-b")


def test_error_wire_names():
    from pennsieve_streaming_spark.serving.transport import error_json

    e = error_json(NotTimeSeriesError("pkg x is not a timeseries"))
    assert e["error"] == "NotTimeSeries"
    e = error_json(DiscoverApiError("boom"))
    assert e["error"] == "DiscoverApiError"


def test_discover_channels_route(spark, channels_df, discover_file):
    """GET /discover/ts/channels resolves through the Discover catalog;
    error lanes surface as 400 with the reference wire names."""
    from pennsieve_streaming_spark.serving.http import (
        RetrieveContext,
        RetrieveHttpServer,
    )

    ctx = RetrieveContext(
        samples=channels_df.sparkSession.createDataFrame(
            [("Fp1", 0, 0.0)], "channel string, ts long, value double"
        ),
        rates={"Fp1": 10.0},
        channels_query=DiscoverChannelsQuery(
            JsonFileDiscoverClient(discover_file),
            {7: DataFrameChannelsQuery(channels_df)},
        ),
    )

    async def get(port, path):
        r, w = await asyncio.open_connection("127.0.0.1", port)
        w.write(f"GET {path} HTTP/1.1\r\nHost: x\r\n\r\n".encode())
        await w.drain()
        status = (await r.readline()).decode()
        raw = await r.read()
        body = raw.split(b"\r\n\r\n", 1)[1]
        w.close()
        return status, body

    async def main():
        server = RetrieveHttpServer(ctx)
        port = await server.start()
        try:
            status, body = await get(port, "/discover/ts/channels?package=pkg-a")
            assert "200" in status
            details = json.loads(body)["channelDetails"]
            assert {d["name"] for d in details} == {"Fp1", "Cz"}
            status, body = await get(port, "/discover/ts/channels?package=pkg-img")
            assert "400" in status
            assert json.loads(body)["error"] == "NotTimeSeries"
            status, body = await get(port, "/discover/ts/channels?package=nope")
            assert "400" in status
            assert json.loads(body)["error"] == "DiscoverApiError"
        finally:
            await server.stop()

    asyncio.run(main())
