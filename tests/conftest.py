import pytest

from github_etl_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small parallelism keeps test wall-clock low; production factory
    # defaults are exercised by bench.py
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"
REFERENCE_ROOT = "/root/reference"
