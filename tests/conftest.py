from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from quant_market_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def events(spark):
    from quant_market_data_pipeline_spark.sources.tables import load_table

    return load_table(spark, "events", SF_DIR).cache()
