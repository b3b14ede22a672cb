import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from kgforge.session import get_spark

    s = get_spark(app_name="kgforge-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def workdir(tmp_path):
    d = tmp_path / "out"
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
