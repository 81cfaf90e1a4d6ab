"""U6-U8 scalar helpers + §2.8 SQL function registration
(reference util_methods.js:149-182, entries.js:65-69)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from apmbackend_spark.functions.percentile import midpoint_percentile_py
from apmbackend_spark.functions.scalars import (
    log_date,
    nf,
    register_functions,
    yyyymmdd_int,
)

MS = 1755086445123  # 2026-08-13 11:20:45.123 UTC


def test_log_date_and_yyyymmdd(spark):
    row = (
        spark.range(1)
        .select(
            log_date(F.lit(MS)).alias("d"),
            yyyymmdd_int(F.lit(MS)).alias("n"),
        )
        .first()
    )
    expect = dt.datetime.fromtimestamp(MS / 1000, dt.timezone.utc)
    assert row["d"] == expect.strftime("%Y-%m-%d %H:%M:%S")
    assert row["n"] == int(expect.strftime("%Y%m%d"))


def test_nf_fixed_decimal(spark):
    row = (
        spark.range(1)
        .select(
            nf(F.lit(12.345), 2).alias("a"),
            nf(F.lit(0.0), 1).alias("zero"),
            nf(F.lit(None).cast("double"), 1).alias("nul"),
            nf(F.lit(1234.5), 1).alias("thousands"),
            nf(F.lit(float("nan")), 1).alias("nan"),
        )
        .first()
    )
    assert row["a"] == "12.35"  # JS (12.345).toFixed(2) == "12.35"
    assert row["zero"] == "0.0"  # reference: 0 is NOT undefined
    assert row["nul"] is None
    assert row["thousands"] == "1234.5"  # no grouping commas
    assert row["nan"] is None


def test_registered_sql_functions(spark):
    register_functions(spark)
    row = spark.sql(
        f"SELECT apm_log_date({MS}) AS d, apm_yyyymmdd({MS}) AS n, "
        f"apm_nf(3.14159, 2) AS s, "
        "apm_percentile(array(1.0D, 2.0D, 3.0D, 4.0D), 75.0D) AS p75"
    ).first()
    expect = dt.datetime.fromtimestamp(MS / 1000, dt.timezone.utc)
    assert row["d"] == expect.strftime("%Y-%m-%d %H:%M:%S")
    assert row["n"] == int(expect.strftime("%Y%m%d"))
    assert row["s"] == "3.14"
    assert row["p75"] == midpoint_percentile_py([1.0, 2.0, 3.0, 4.0], 75)


def test_registered_percentile_matches_python_everywhere(spark):
    register_functions(spark)
    cases = [
        ([5.0], 50),
        ([1.0, 2.0], 50),
        ([1.0, 2.0, 3.0], 0),
        ([1.0, 2.0, 3.0], 100),
        ([1.0, 2.0, 3.0, 4.0, 5.0], 75),
        ([3.0, 7.0, 8.0, 12.0, 13.0, 14.0, 18.0, 21.0, 30.0], 95),
    ]
    arr_sql = ", ".join(
        f"apm_percentile(array({', '.join(f'{v}D' for v in vals)}), {p}.0D) AS c{i}"
        for i, (vals, p) in enumerate(cases)
    )
    row = spark.sql(f"SELECT {arr_sql}").first()
    for i, (vals, p) in enumerate(cases):
        assert row[f"c{i}"] == midpoint_percentile_py(vals, p), (vals, p)


def test_registered_zscore_step_matches_reference(spark):
    from apmbackend_spark.operators.zscore import zscore_step

    register_functions(spark)
    hist = [100.0, 110.0, 90.0, 105.0, 95.0]
    row = spark.sql(
        "SELECT apm_zscore_step(5, 3.0D, 0.1D, 1000.0D, "
        "array(100.0D, 110.0D, 90.0D, 105.0D, 95.0D)) AS st"
    ).first()["st"]
    infl, avg, lb, ub, sig = zscore_step(5, 3.0, 0.1, 1000.0, hist)
    assert (row["infl"], row["avg"], row["signal"]) == (infl, avg, sig)
    assert row["lb"] == lb and row["ub"] == ub
