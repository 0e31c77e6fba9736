import sys

import pytest

sys.path.insert(0, "/root/repo")

from rakam_api_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rakam-api-spark-tests", cpus=8)
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")
