"""Shared Spark session for the test suite (local[8], tuned small)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from mojap_arrow_pd_parser_spark.session import get_spark

    s = get_spark("pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
