"""Unit + property tests for the midpoint-rule percentile
(reference util_methods.js:112-142; edge vectors from FIXTURES.md F-8)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from apmbackend_spark.functions.percentile import (
    midpoint_percentile,
    midpoint_percentile_py,
    midpoint_percentile_sql,
)


def js_reference(sorted_vals, p):
    """Literal re-derivation of the reference rule for cross-checking."""
    import math

    n = len(sorted_vals)
    if n == 0:
        return None
    if p == 0:
        return sorted_vals[0]
    if p == 100:
        return sorted_vals[-1]
    index = (p / 100.0) * n - 1.0
    if n == 1 or index % 1 == 0:
        return sorted_vals[int(index)]
    index = int(math.ceil(index))
    if index == n - 1:
        return sorted_vals[index]
    return (sorted_vals[index] + sorted_vals[index + 1]) / 2


# FIXTURES.md F-8 edge vectors
CASES = [
    ([5], 75, 5.0),                     # N=1
    ([1, 2, 3, 4], 0, 1.0),             # p=0
    ([1, 2, 3, 4], 100, 4.0),           # p=100
    ([1, 2, 3, 4], 75, 3.0),            # integer index (idx=2)
    ([1, 2, 3, 4, 5], 75, 4.5),         # midpoint (a[3]+a[4])/2
    ([1, 2, 3], 75, 3.0),               # ceil hits last index
    ([1, 2], 25, 1.5),                  # negative fractional idx -> (a[0]+a[1])/2
    ([10, 20, 30, 40, 50, 60, 70, 80, 90, 100], 95, 100.0),  # ceil(8.5)=9=last
]


@pytest.mark.parametrize("vals,p,expected", CASES)
def test_python_vectors(vals, p, expected):
    assert midpoint_percentile_py(vals, p) == expected
    assert js_reference(vals, p) == expected


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=200),
    st.sampled_from([0, 1, 5, 25, 50, 75, 90, 95, 99, 100]),
)
@settings(max_examples=300, deadline=None)
def test_python_matches_js_reference(vals, p):
    vals = sorted(vals)
    assert midpoint_percentile_py(vals, p) == js_reference(vals, p)


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=100),
)
@settings(max_examples=200, deadline=None)
def test_bounded(vals):
    # NOTE: the reference rule is genuinely NON-monotone in p at small N
    # (e.g. [0,1]: p=10 -> 0.5 midpoint but p=50 -> a[0]=0, because the
    # integer-index branch bypasses the midpoint), so only boundedness holds.
    vals = sorted(vals)
    for p in (0, 10, 25, 50, 75, 90, 95, 100):
        r = midpoint_percentile_py(vals, p)
        assert vals[0] <= r <= vals[-1]


def test_spark_and_duckdb_agree_with_python(spark):
    import duckdb

    from pyspark.sql import functions as F

    vectors = [c[0] for c in CASES] + [[], [3, 1, 4, 1, 5, 9, 2, 6]]
    rows = [(i, sorted(v)) for i, v in enumerate(vectors)]
    df = spark.createDataFrame(rows, "id int, arr array<long>")
    for p in (0, 50, 75, 95, 100):
        got = {
            r["id"]: r["pct"]
            for r in df.select("id", midpoint_percentile(F.col("arr"), p).alias("pct")).collect()
        }
        sql_expr = midpoint_percentile_sql("a", p)
        for i, v in rows:
            expect = midpoint_percentile_py(v, p)
            assert got[i] == expect, f"spark p={p} vec={v}"
            duck = duckdb.sql(
                f"SELECT {sql_expr} AS pct FROM (SELECT {v!r}::BIGINT[] AS a)"
            ).fetchone()[0]
            assert duck == expect, f"duckdb p={p} vec={v}"
