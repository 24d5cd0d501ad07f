import pytest


@pytest.fixture(scope="session")
def spark():
    from hepcrawl_spark.session import get_spark
    spark = get_spark("hepcrawl-spark-tests", cpus=4, shuffle_partitions=8)
    yield spark
