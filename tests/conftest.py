from __future__ import annotations

import pytest

from big_data_toolkit_spark.session import build_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = build_spark(app_name="bdts-tests", master="local[4]")
    yield spark
    spark.stop()
