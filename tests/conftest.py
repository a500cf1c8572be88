import pytest

from pl_marker_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="pl-marker-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
