from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from parquet_main_spark.session import get_spark

    s = get_spark(cores=8, app="pytest", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
