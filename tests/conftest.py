from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from minhash_spark.session import build_session, tune_malloc_env  # noqa: E402

tune_malloc_env()


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="minhash-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
