"""REST retrieve-endpoint e2e tests: every route of the reference's
HTTP surface (ContinuousQueryService / UnitQueryService /
SegmentService / MontageValidationService / health, WebServer auth
tree) driven over a real socket against the engine."""

from __future__ import annotations

import asyncio
import json

import pytest

from pennsieve_streaming_spark.serving import (
    RetrieveContext,
    RetrieveHttpServer,
    sign_token,
)

SECRET = "test-secret"


@pytest.fixture(scope="module")
def ctx(spark):
    rows = [("Fp1", i * 1_000_000, float(i)) for i in range(100)]
    samples = spark.createDataFrame(
        rows, "channel string, ts long, value double"
    ).cache()
    events = spark.createDataFrame(
        [("Fp1", i * 5_000_000) for i in range(20)], "channel string, ts long"
    ).cache()
    # two contiguous runs of catalog ranges separated by a big gap
    ranges = spark.createDataFrame(
        [
            ("Fp1", 0, 10_000_000),
            ("Fp1", 10_000_000, 20_000_000),
            ("Fp1", 50_000_000, 60_000_000),
        ],
        "channel string, lo long, hi long",
    ).cache()
    return RetrieveContext(
        samples=samples,
        rates={"Fp1": 1.0, "Cz": 1.0, "C3": 1.0, "C4": 1.0,
               "O1": 1.0, "O2": 1.0, "F3": 1.0, "F4": 1.0,
               "Fp2": 1.0, "P3": 1.0, "P4": 1.0},
        events=events,
        ranges=ranges,
        query_limit=1000,
        default_gap_threshold=5_000_000.0,
    )


async def _get(port: int, path: str, token: str | None = None):
    r, w = await asyncio.open_connection("127.0.0.1", port)
    auth = f"Authorization: Bearer {token}\r\n" if token else ""
    w.write(f"GET {path} HTTP/1.1\r\nHost: x\r\n{auth}\r\n".encode())
    await w.drain()
    status_line = (await r.readline()).decode()
    status = int(status_line.split(" ")[1])
    headers = {}
    while True:
        line = (await r.readline()).decode().strip()
        if not line:
            break
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    body = await r.read(int(headers.get("content-length", 0)))
    w.close()
    return status, body.decode()


def _run(ctx, coro_factory, jwt_secret=None):
    async def go():
        server = RetrieveHttpServer(ctx, jwt_secret=jwt_secret)
        port = await server.start()
        try:
            return await coro_factory(port)
        finally:
            await server.stop()

    return asyncio.run(go())


def test_continuous_route(ctx):
    async def drive(port):
        return await _get(
            port, "/ts/retrieve/continuous?start=10000000&end=15000000&channel=Fp1"
        )

    status, body = _run(ctx, drive)
    assert status == 200
    data = json.loads(body)
    assert data == [[(10 + i) * 1_000_000, float(10 + i)] for i in range(5)]


def test_continuous_limit_param(ctx):
    async def drive(port):
        return await _get(
            port,
            "/ts/retrieve/continuous?start=0&end=99000000&channel=Fp1&limit=3",
        )

    status, body = _run(ctx, drive)
    assert status == 200
    assert json.loads(body) == [[0, 0.0], [1_000_000, 1.0], [2_000_000, 2.0]]


def test_continuous_over_limit_and_errors(ctx):
    async def drive(port):
        over = await _get(
            port,
            "/ts/retrieve/continuous?start=0&end=2000000000000&channel=Fp1",
        )
        missing = await _get(port, "/ts/retrieve/continuous?channel=Fp1")
        unknown = await _get(
            port, "/ts/retrieve/continuous?start=0&end=1&channel=Zz"
        )
        badlong = await _get(
            port, "/ts/retrieve/continuous?start=x&end=1&channel=Fp1"
        )
        return over, missing, unknown, badlong

    over, missing, unknown, badlong = _run(ctx, drive)
    assert over[0] == 400 and "exceeded retrieval limit" in over[1]
    assert missing[0] == 400
    assert unknown[0] == 404
    assert json.loads(unknown[1])["channelNames"] == ["Zz"]
    assert badlong[0] == 400


def test_unit_route(ctx):
    async def drive(port):
        ok = await _get(
            port, "/ts/retrieve/unit?start=0&end=30000000&channel=Fp1&limit=4"
        )
        over = await _get(
            port,
            "/ts/retrieve/unit?start=0&end=2000000000000&channel=Fp1",
        )
        return ok, over

    ok, over = _run(ctx, drive)
    assert ok[0] == 200
    assert json.loads(ok[1]) == [0, 5_000_000, 10_000_000, 15_000_000]
    assert over[0] == 400


def test_segments_route(ctx):
    async def drive(port):
        full = await _get(port, "/ts/retrieve/segments?channel=Fp1")
        windowed = await _get(
            port, "/ts/retrieve/segments?channel=Fp1&start=0&end=15000000"
        )
        fine = await _get(
            port, "/ts/retrieve/segments?channel=Fp1&gapThreshold=1"
        )
        bad = await _get(
            port, "/ts/retrieve/segments?channel=Fp1&gapThreshold=oops"
        )
        return full, windowed, fine, bad

    full, windowed, fine, bad = _run(ctx, drive)
    # default threshold 5ms merges the contiguous pair, keeps the gap
    assert full[0] == 200
    assert json.loads(full[1]) == [[0, 20_000_000], [50_000_000, 60_000_000]]
    # windowed lookup only sees the overlapping ranges
    assert json.loads(windowed[1]) == [[0, 20_000_000]]
    # threshold=1 keeps back-to-back ranges separate (gap 0 < 1 merges!)
    assert fine[0] == 200
    assert bad[0] == 400 and "problem parsing double" in bad[1]


def test_validate_montage_route(ctx, spark):
    async def drive(port):
        return await _get(port, "/ts/validate-montage?package=p1")

    status, body = _run(ctx, drive)
    # the fixture rate map carries a full 10-20 subset: all montage
    # schemes validate -> 200 empty body (MontageValidationService)
    if status != 200:
        # schemes need channels beyond the fixture: the error must be
        # the reference shape with channelNames populated
        err = json.loads(body)
        assert err["channelNames"]
        assert status == 400
    else:
        assert body == ""


def test_health_route_no_auth(ctx):
    async def drive(port):
        return await _get(port, "/ts/health")

    status, body = _run(ctx, drive, jwt_secret=SECRET)
    assert status == 200
    h = json.loads(body)
    assert set(h) == {"connections", "age", "currentTime"}


def test_auth_decision_tree(ctx):
    good = sign_token({"type": "user", "sub": "u1"}, SECRET)
    service = sign_token({"type": "service"}, SECRET)
    forged = sign_token({"type": "user"}, "wrong-secret")

    async def drive(port):
        path = "/ts/retrieve/continuous?start=0&end=5000000&channel=Fp1"
        no_tok = await _get(port, path)
        bad_tok = await _get(port, path, token="not.a.jwt")
        forged_tok = await _get(port, path, token=forged)
        svc = await _get(port, path, token=service)
        ok = await _get(port, path, token=good)
        return no_tok, bad_tok, forged_tok, svc, ok

    no_tok, bad_tok, forged_tok, svc, ok = _run(ctx, drive, jwt_secret=SECRET)
    assert no_tok[0] == 401          # missing credentials
    assert bad_tok[0] == 400         # unparseable token
    assert forged_tok[0] == 400      # bad signature
    assert svc[0] == 401             # service claims may not query
    assert ok[0] == 200
    assert json.loads(ok[1]) == [[i * 1_000_000, float(i)] for i in range(5)]


def test_unknown_route_404(ctx):
    async def drive(port):
        return await _get(port, "/ts/retrieve/nope?x=1")

    status, _ = _run(ctx, drive)
    assert status == 404


def test_launcher_end_to_end(spark):
    """build_engine + start_servers over the real sf0.001 tables: the
    REST continuous route, the health route, and the WS handshake all
    answer from one wiring (the reference WebServer composition)."""
    import asyncio as aio
    import base64 as b64
    import os as _os

    from pennsieve_streaming_spark.serving.launcher import (
        build_engine,
        start_servers,
        stop_servers,
    )

    engine = build_engine(spark, "/root/testdata/sf0.001")
    chan, rate = next(iter(engine.rates.items())), None
    name = chan[0]
    lo = engine.samples.filter(f"channel = '{name}'").agg(
        {"ts": "min"}
    ).collect()[0][0]

    async def drive():
        handles = await start_servers(engine)
        try:
            status, body = await _get(
                handles["http"],
                f"/ts/retrieve/continuous?start={lo}&end={lo + 10_000_000}"
                f"&channel={name}&limit=5",
            )
            assert status == 200
            rows = json.loads(body)
            assert 0 < len(rows) <= 5
            h_status, h_body = await _get(handles["http"], "/ts/health")
            assert h_status == 200 and "connections" in h_body
            # WS handshake answers 101 on the query route
            r, w = await aio.open_connection("127.0.0.1", handles["ws"])
            key = b64.b64encode(_os.urandom(16)).decode()
            w.write(
                (
                    "GET /ts/query?package=p HTTP/1.1\r\nHost: x\r\n"
                    "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                    f"Sec-WebSocket-Key: {key}\r\n\r\n"
                ).encode()
            )
            await w.drain()
            assert "101" in (await r.readline()).decode()
            w.close()
        finally:
            await stop_servers(handles)

    asyncio.run(drive())
