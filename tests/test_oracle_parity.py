"""Every oracle-paired query must match DuckDB exactly (SURVEY.md §5.1).

This mirrors the driver's t2 correctness gate, run at sf0.001 for speed in
the default suite; set SDT_PARITY_SF=/root/testdata/sf0.01 to run the same
scale the driver uses.
"""

from __future__ import annotations

import os

import pytest

from synthetic_data_transfer_to_relational_database_spark import registry

from .oracle_harness import compare, duck_connection

SF = os.environ.get("SDT_PARITY_SF", "/root/testdata/sf0.001")

_QUERIES = registry.all_queries()
_ORACLES = registry.all_oracles()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_ORACLES.keys()))
def test_oracle_parity(spark, duck, name):
    df = _QUERIES[name](spark, SF)
    compare(df, duck, _ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
