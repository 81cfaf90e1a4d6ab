"""Differential tests: every queries() entry vs its DuckDB oracle at sf0.001
— a local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from apmbackend_spark.testing import compare_query
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    ok, msg = compare_query(spark, SF_SMOKE, QUERIES[name], ORACLES.get(name))
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
