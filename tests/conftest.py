from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from synthetic_data_transfer_to_relational_database_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sdt-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_dir_mid():
    return SF_CORRECT
