from __future__ import annotations

import os
import tempfile

import pytest

from urban_mobility_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("UMDP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="umdp-tests",
        master="local[8]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
            # keep bucketed-table tests out of the repo cwd
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="umdp_wh_"),
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
