from __future__ import annotations

import os

import pytest

from platform_etl_backend_spark.engine.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("petl-tests", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "4",
                                  "spark.sql.warehouse.dir": "/tmp/petl-warehouse"})
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
