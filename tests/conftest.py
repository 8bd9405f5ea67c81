"""Shared fixtures: one SparkSession per test session, fixture dirs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from open_source_etl_spark.conf import EngineConfig
    from open_source_etl_spark.session import build_session

    cfg = EngineConfig(master="local[8]", shuffle_partitions=8)
    session = build_session(cfg)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("OSETL_TEST_SF_DIR", SF_SMOKE)
