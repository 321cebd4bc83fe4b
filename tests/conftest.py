from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pennsieve_streaming_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pss-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Surface the env-gated transformWithState skips in the suite
    summary (VERDICT r9 item 7): a protobuf-equipped container flips
    them to runs with zero edits, so make the gate visible instead of
    burying it in per-test skip reasons."""
    tws = [
        rep
        for rep in terminalreporter.stats.get("skipped", [])
        if "transformWithState" in str(getattr(rep, "longrepr", ""))
    ]
    if tws:
        terminalreporter.write_line(
            f"NOTE: {len(tws)} transformWithStateInPandas e2e test(s) "
            "env-skipped — Spark 4's Python state server needs the "
            "'protobuf' package (pip install protobuf enables them; "
            "the processor logic is still covered by fake-handle and "
            "_advance property tests)."
        )
