import pytest

from engine.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("engine-tests", cores=4, shuffle_partitions=8, driver_mem="8g")
    yield s
