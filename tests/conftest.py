from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from tripwire_spark.session import get_spark

    s = get_spark("tripwire_spark_tests", cores=4, shuffle_partitions=8)
    yield s
