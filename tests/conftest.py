from __future__ import annotations

import pytest

from datatrove_spark.registry import TABLES
from datatrove_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


def duck_connect(sf_dir: str):
    """DuckDB connection with the same pre-registered views the driver uses."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.fixture(scope="session")
def spark():
    yield get_spark(app_name="datatrove-spark-tests", master="local[4]", shuffle_partitions=4)


@pytest.fixture(scope="session")
def duck_small():
    con = duck_connect(SF_SMALL)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_medium():
    con = duck_connect(SF_MEDIUM)
    yield con
    con.close()
