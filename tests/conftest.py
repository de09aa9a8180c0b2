from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from parquet2csv_spark.session import get_spark

    s = get_spark(cpus=8, app="pytest")
    yield s
