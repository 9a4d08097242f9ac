import pytest

from wos_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "wos-tests",
        cores=4,
        shuffle_partitions=8,
        # tmpfs shuffle dir: the sandbox's ext4 root serializes
        # concurrent shuffle-file creates (see tools/bench_scaling.py)
        extra_conf={"spark.local.dir": "/dev/shm/wcs-tests"},
    )
    yield spark
