"""Shared fixtures: one session-scoped SparkSession on local[*]."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    cfg = EngineConfig(shuffle_partitions=8)
    s = get_spark("tegenaria-tests", master="local[4]", config=cfg)
    yield s
    s.stop()


@pytest.fixture()
def tmp_store_dir():
    d = tempfile.mkdtemp(prefix="tegenaria-store-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
