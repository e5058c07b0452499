"""Shared fixtures: one session-scoped SparkSession on local[*]."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from tegenaria_spark.config import EngineConfig
from tegenaria_spark.session import get_spark

# tiny test rounds: 2 part-files per table write is plenty, and every
# saved write task is saved wall across the ~100 commits the suite runs
os.environ.setdefault("TEGENARIA_COMMIT_MAX_FILES", "2")


@pytest.fixture(scope="session")
def spark():
    cfg = EngineConfig(shuffle_partitions=8)
    s = get_spark("tegenaria-tests", master="local[8]", config=cfg)
    yield s
    s.stop()


@pytest.fixture()
def tmp_store_dir():
    # /dev/shm: the suite's store I/O is hundreds of tiny parquet
    # commits — tmpfs keeps them off the VM disk (same rationale as the
    # bench store)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="tegenaria-store-", dir=base)
    yield d
    shutil.rmtree(d, ignore_errors=True)
