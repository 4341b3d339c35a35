import pytest

from wikidata_dump_processor_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wdp-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
