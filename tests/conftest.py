import pytest


@pytest.fixture(scope="session")
def spark():
    from netbase_spark.session import get_spark

    s = get_spark(app="netbase_spark_tests", cpus=8, shuffle_partitions=8, driver_memory="8g")
    yield s
