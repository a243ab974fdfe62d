import pytest


@pytest.fixture(scope="session")
def spark():
    from gdal_spark import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s
