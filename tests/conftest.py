import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from krawler_spark.session import get_spark

    s = get_spark("krawler-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")
