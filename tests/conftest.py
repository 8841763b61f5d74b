from __future__ import annotations

import contextlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from airflow_project_flight_price_analysis_spark.session import get_spark

    spark = get_spark(app_name="fpa-tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()


@contextlib.contextmanager
def session_conf(spark, key: str, value: str):
    """Temporarily set a SESSION conf, restoring the session's prior
    value afterward. `conf.unset` is the wrong restore for confs the
    session builder configured: it falls back to Spark's hardcoded
    default (e.g. autoBroadcastJoinThreshold 10MB, not the session's
    64MB), silently leaking into every later test (r8 review)."""
    prev = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, prev)
