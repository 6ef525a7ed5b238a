from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("CDC_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from cdc_example_spark.session import get_spark

    s = get_spark("cdc_example_spark-tests", shuffle_partitions=8,
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.driver.memory": "8g"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
