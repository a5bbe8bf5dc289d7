"""Shared Spark fixture for the test suite."""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # fast local test sessions


@pytest.fixture(scope="session")
def spark():
    from extremexp_knowledge_graph_spark.session import get_spark

    s = get_spark("extremexp-kg-tests", shuffle_partitions=8)
    yield s
    s.stop()


REFERENCE_DATA = "/root/reference/extremexp_kg_matic/data"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
