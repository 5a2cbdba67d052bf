import pytest

from sedona_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sedona_spark_tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
