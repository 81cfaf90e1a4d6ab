"""Exact midpoint-rule percentile (reference ``util_methods.js:112-142``).

The reference computes percentiles over the *sorted* window array with a
non-standard rule that matches no stock definition (not nearest-rank, not
linear interpolation):

    index = (p/100)*N - 1
    N == 0            -> undefined
    p == 0            -> a[0];  p == 100 -> a[N-1]
    N == 1 or integer -> a[trunc(index)]
    else i = ceil(index):
        i == N-1      -> a[i]
        else          -> (a[i] + a[i+1]) / 2      # midpoint rule

This module emits the SAME rule twice — once as a Spark Column expression and
once as DuckDB SQL text — so `queries()` and `oracle_sql()` can never drift.
Both use identical IEEE-double arithmetic ((p/100.0)*N - 1.0) so branch
decisions are bit-identical across engines.

Scale note: the expression form runs entirely inside whole-stage codegen over
a `sort_array(collect_list(...))` per-group array. Exact percentiles require
the group's full multiset by definition; groups here are bounded by traffic
per (server, service, window), which is independent of total data size, so
this holds at 100 TB. For unbounded groups use `percentile_approx` (the
documented perf path), never this.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def midpoint_percentile(sorted_arr: Column, p: float) -> Column:
    """Exact percentile over an already-sorted numeric array column."""
    n = F.size(sorted_arr)
    nd = n.cast("double")
    idx = (F.lit(float(p)) / F.lit(100.0)) * nd - F.lit(1.0)
    is_int = idx == F.floor(idx).cast("double")
    i_trunc = idx.cast("int")  # JS parseInt truncates toward zero
    i_ceil = F.ceil(idx).cast("int")
    elem = lambda i: F.element_at(sorted_arr, i).cast("double")  # noqa: E731

    return (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(F.lit(float(p)) == 0.0, elem(F.lit(1)))
        .when(F.lit(float(p)) == 100.0, elem(n))
        .when(n == 1, elem(F.lit(1)))
        .when(is_int, elem(i_trunc + 1))
        .when(i_ceil == n - 1, elem(i_ceil + 1))
        .otherwise((elem(i_ceil + 1) + elem(i_ceil + 2)) / F.lit(2.0))
    )


def midpoint_percentile_sql(sorted_arr_sql: str, p: float) -> str:
    """The identical rule as DuckDB SQL over a sorted-list expression.

    ``sorted_arr_sql`` must be a DuckDB LIST expression sorted ascending
    (e.g. ``list_sort(list(elapsed))``). DuckDB lists are 1-indexed.
    """
    a = sorted_arr_sql
    idx = f"((({p!r} / 100.0) * CAST(len({a}) AS DOUBLE)) - 1.0)"
    return f"""CAST(CASE
        WHEN len({a}) = 0 THEN NULL
        WHEN {p!r} = 0.0 THEN {a}[1]
        WHEN {p!r} = 100.0 THEN {a}[len({a})]
        WHEN len({a}) = 1 THEN {a}[1]
        WHEN {idx} = floor({idx}) THEN {a}[CAST({idx} AS INT) + 1]
        WHEN CAST(ceil({idx}) AS INT) = len({a}) - 1 THEN {a}[CAST(ceil({idx}) AS INT) + 1]
        ELSE (CAST({a}[CAST(ceil({idx}) AS INT) + 1] AS DOUBLE)
              + CAST({a}[CAST(ceil({idx}) AS INT) + 2] AS DOUBLE)) / 2.0
    END AS DOUBLE)"""


def midpoint_percentile_py(sorted_vals: list[float], p: float):
    """Pure-Python reference of the same rule, for unit/property tests."""
    n = len(sorted_vals)
    if n == 0:
        return None
    if p == 0:
        return float(sorted_vals[0])
    if p == 100:
        return float(sorted_vals[-1])
    idx = (p / 100.0) * n - 1.0
    if n == 1 or idx == int(idx):
        return float(sorted_vals[int(idx)])
    i = -int(-idx // 1)  # ceil
    if i == n - 1:
        return float(sorted_vals[i])
    return (sorted_vals[i] + sorted_vals[i + 1]) / 2.0
