from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cryo_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="cryo_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sequences_path(tmp_path_factory):
    """Smoke-scale synthetic sequences table (FIXTURES.md §1, n=10_000)."""
    from cryo_spark.fixtures import write_sequences

    path = str(tmp_path_factory.mktemp("data") / "sequences.parquet")
    write_sequences(path, n=10_000, seed=42)
    return path
