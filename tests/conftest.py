import pytest

from wos_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("wos-tests", cores=4, shuffle_partitions=8)
    yield spark
