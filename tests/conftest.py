import pytest

from kstore_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kstore-tests", shuffle_partitions=8)
    yield s
    s.stop()
