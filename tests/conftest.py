import pytest

from wss_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="wss_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(spark):
    from wss_spark.synth import build_pages_df

    df = build_pages_df(spark, 60, seed=42).cache()
    df.count()
    return df
