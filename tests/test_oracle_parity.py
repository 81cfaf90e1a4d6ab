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


def test_props_rollup_oracle_survives_hostile_json(spark, tmpdir):
    """The rollup advertises malformed-JSON accounting; the oracle must
    DEGRADE (k NULL, counted as unparsed) on such rows exactly like
    Spark's strict from_json — not abort, not coerce quoted numbers."""
    import duckdb

    from apmbackend_spark.operators.semistruct import (
        PROPS_ROLLUP_ORACLE,
        props_rollup,
    )

    rows = [
        ("a", '{"k": 3}'),
        ("a", "not json"),
        ("a", '{"k": "abc"}'),
        ("a", '{"k": "7"}'),   # quoted number: Spark from_json -> NULL
        ("a", '{"k": 5.7}'),   # non-integer: Spark from_json -> NULL
        ("b", '{"j": 1}'),
        ("b", None),
    ]
    sdf = spark.createDataFrame(rows, "event_type string, props string")
    got = {
        r["event_type"]: (r["n"], r["sum_k"], r["n_distinct_k"], r["n_unparsed"])
        for r in props_rollup(sdf).collect()
    }

    pq = f"{tmpdir}/events.parquet"
    sdf.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}')")
    want = {
        r[0]: tuple(r[1:]) for r in con.sql(PROPS_ROLLUP_ORACLE).fetchall()
    }
    assert got == want
    assert got["a"] == (5, 3, 1, 4)  # only the JSON-integer k parses
