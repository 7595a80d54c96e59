"""The main correctness gate, locally: every query in the inventory
with an oracle must match DuckDB exactly at sf0.01 (what the driver
runs); rows-only queries must at least execute and return a stable
schema."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle import compare, duckdb_con


def _inventory():
    from ramen_spark.queries import ORACLES, QUERIES

    return QUERIES, ORACLES


QUERIES, ORACLES = _inventory()


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, con, name):
    sdf = QUERIES[name](spark, SF_ORACLE)
    odf = con.sql(ORACLES[name]).df()
    errs = compare(sdf, odf)
    assert not errs, f"{name}: " + "; ".join(errs[:5])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
