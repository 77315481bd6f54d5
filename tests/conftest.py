import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from ragflow_spark.session import get_spark

    s = get_spark(app_name="ragflow_spark_tests", master="local[4]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="ragflow_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_SMOKE = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
