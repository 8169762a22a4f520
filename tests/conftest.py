from __future__ import annotations

import duckdb
import pytest

from spark_cherry_shuffle_service_spark.session import get_spark
from spark_cherry_shuffle_service_spark.sources.catalog import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="cherry-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    return duck_connection(SF_SMOKE)


@pytest.fixture(scope="session")
def duck_correct():
    return duck_connection(SF_CORRECT)
