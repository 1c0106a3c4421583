from __future__ import annotations

import pytest

from consumer_loans_analysis_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_configs={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
