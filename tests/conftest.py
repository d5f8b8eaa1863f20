import pytest

from crawler_spark.sparkutils import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawler-spark-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def unit_corpus():
    from crawler_spark.sources.corpus import gen_corpus

    return gen_corpus(hosts=3, pages_per_host=10, seed=42)
