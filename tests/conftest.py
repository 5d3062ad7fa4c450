from __future__ import annotations

import pytest

from sparkstreamingrealtimedatawithkafka_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="ssk-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra={"spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()
