from __future__ import annotations

import shutil
import tempfile

import pytest

from otel_worker_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark(app_name="tests", cores=8, shuffle_partitions=8)


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="ows-test-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
