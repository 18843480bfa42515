import os

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from exactextractr_spark.session import get_spark

    s = get_spark("exactextractr-spark-tests", shuffle_partitions=4)
    yield s
