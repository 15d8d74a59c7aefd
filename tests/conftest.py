"""Shared Spark session for the test suite (local[8], tuned small).

The AWS/moto wiring lives HERE, at import time, because the python
workers Spark forks inherit the JVM's environment as captured when the
SparkSession is created: executor-side fsio calls (chunk/sidecar puts,
pyarrow S3 reads) resolve the moto endpoint from env at call time *in
the worker process*, so the variables must exist before the first
fixture spins the JVM up. Harmless for every non-S3 test — nothing
else reads them — and `setdefault` keeps a caller-provided real AWS
environment intact.
"""

from __future__ import annotations

import os

import pytest

#: fixed loopback port the moto server (tests/test_fsio.py) binds
MOTO_PORT = 41414

os.environ.setdefault("AWS_ACCESS_KEY_ID", "test")
os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "test")
os.environ.setdefault("AWS_ENDPOINT_URL", f"http://127.0.0.1:{MOTO_PORT}")
os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
os.environ.setdefault("AWS_EC2_METADATA_DISABLED", "true")


@pytest.fixture(scope="session")
def spark():
    from mojap_arrow_pd_parser_spark.session import get_spark

    s = get_spark("pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()
