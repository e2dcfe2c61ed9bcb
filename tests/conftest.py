from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from gelos_spark.session import get_spark

    s = get_spark("gelos_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
