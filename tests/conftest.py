import pytest

from sparkfuse.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sparkfuse-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
