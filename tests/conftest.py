import pytest


@pytest.fixture(scope="session")
def spark():
    from anomalydetector_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages(spark):
    from anomalydetector_spark.datagen import generate_pages

    df = generate_pages(spark, 30_000).cache()
    df.count()
    yield df
    df.unpersist()
