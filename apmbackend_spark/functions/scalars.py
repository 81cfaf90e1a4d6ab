"""Scalar date/number helpers (SURVEY.md §2.7 U6-U8) and the §2.8 SQL
function registrations.

Reference parity:
  * log_date     — ``util_methods.js:149-176`` convertDateToLogDate:
                   "yyyy-MM-dd HH:mm:ss", zero-padded, local == session TZ
                   (pinned UTC here so epoch math is deterministic).
  * yyyymmdd_int — ``util_methods.js:178-182`` convertDateToYYYYMMDDNumber:
                   the date as a single integer, e.g. 20260813.
  * nf           — ``entries.js:65-69``: fixed-decimal string for CSV lines;
                   undefined (null) for null/NaN, "0.0" for zero. JS
                   toFixed rounds on the decimal expansion of the binary
                   double; format_number's HALF_UP matches it on every
                   value the pipeline emits (ms-grid metrics).

All three are thin wrappers over built-in JVM expressions — no Python UDFs.

``register_functions`` exposes the engine's custom semantics to plain
``spark.sql(...)`` users (SURVEY.md §2.8): the scalar helpers and the exact
midpoint percentile as SQL UDFs (Spark 4 ``CREATE TEMPORARY FUNCTION ...
RETURN expr`` — body inlines into the plan, stays in codegen), plus the
reference z-score step (``stream_calc_z_score.js:66-104``) as a typed
Python UDF, since its recursive state update is not SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

LOG_DATE_FMT = "yyyy-MM-dd HH:mm:ss"


def log_date(ms: Column) -> Column:
    """U6: epoch-millis -> "yyyy-MM-dd HH:mm:ss" (session TZ, pinned UTC)."""
    return F.date_format(F.timestamp_millis(ms.cast("long")), LOG_DATE_FMT)


def log_date_sql(expr: str) -> str:
    """DuckDB twin (naive timestamps are UTC, matching the pinned session)."""
    return f"strftime(epoch_ms(CAST({expr} AS BIGINT)), '%Y-%m-%d %H:%M:%S')"


def yyyymmdd_int(ms: Column) -> Column:
    """U7: epoch-millis -> yyyymmdd integer."""
    return F.date_format(F.timestamp_millis(ms.cast("long")), "yyyyMMdd").cast(
        "int"
    )


def yyyymmdd_int_sql(expr: str) -> str:
    return f"CAST(strftime(epoch_ms(CAST({expr} AS BIGINT)), '%Y%m%d') AS INT)"


def nf(num: Column, fixed: int = 1) -> Column:
    """U8: fixed-decimal string; null for null/NaN (JS `!num && num !== 0`)."""
    return F.when(
        num.isNull() | F.isnan(num.cast("double")), F.lit(None).cast("string")
    ).otherwise(
        F.regexp_replace(F.format_number(num.cast("double"), fixed), ",", "")
    )


def nf_sql(expr: str, fixed: int = 1) -> str:
    """DuckDB twin: printf %.Nf (HALF_UP-equivalent on pipeline values)."""
    return (
        f"CASE WHEN {expr} IS NULL OR isnan(CAST({expr} AS DOUBLE)) THEN NULL "
        f"ELSE printf('%.{fixed}f', CAST({expr} AS DOUBLE)) END"
    )


def _midpoint_percentile_sql_spark(arr: str, p: str) -> str:
    """The exact midpoint-percentile rule (util_methods.js:112-142) as a
    Spark SQL expression over a pre-sorted array — same branch arithmetic
    as functions/percentile.py so the two can never drift."""
    n = f"size({arr})"
    idx = f"(({p} / 100.0D) * CAST({n} AS DOUBLE) - 1.0D)"
    return f"""CASE
        WHEN {n} = 0 THEN CAST(NULL AS DOUBLE)
        WHEN {p} = 0.0D THEN CAST(element_at({arr}, 1) AS DOUBLE)
        WHEN {p} = 100.0D THEN CAST(element_at({arr}, {n}) AS DOUBLE)
        WHEN {n} = 1 THEN CAST(element_at({arr}, 1) AS DOUBLE)
        WHEN {idx} = CAST(floor({idx}) AS DOUBLE)
            THEN CAST(element_at({arr}, CAST({idx} AS INT) + 1) AS DOUBLE)
        WHEN CAST(ceil({idx}) AS INT) = {n} - 1
            THEN CAST(element_at({arr}, CAST(ceil({idx}) AS INT) + 1) AS DOUBLE)
        ELSE (CAST(element_at({arr}, CAST(ceil({idx}) AS INT) + 1) AS DOUBLE)
              + CAST(element_at({arr}, CAST(ceil({idx}) AS INT) + 2) AS DOUBLE)) / 2.0D
    END"""


def register_functions(spark: SparkSession) -> None:
    """Idempotently register the engine's custom semantics for SQL use."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION apm_log_date(ms BIGINT) "
        "RETURNS STRING RETURN "
        f"date_format(timestamp_millis(ms), '{LOG_DATE_FMT}')"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION apm_yyyymmdd(ms BIGINT) "
        "RETURNS INT RETURN "
        "CAST(date_format(timestamp_millis(ms), 'yyyyMMdd') AS INT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION apm_nf(num DOUBLE, fixed INT) "
        "RETURNS STRING RETURN "
        "CASE WHEN num IS NULL OR isnan(num) THEN NULL "
        "ELSE replace(format_number(num, fixed), ',', '') END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION "
        "apm_percentile(arr ARRAY<DOUBLE>, p DOUBLE) RETURNS DOUBLE RETURN "
        + _midpoint_percentile_sql_spark("arr", "p")
    )

    # A9's step is recursive state, not SQL-expressible — typed Python UDF.
    from apmbackend_spark.operators.zscore import zscore_step

    def _step(lag, threshold, influence, new_value, history):
        infl, avg, lb, ub, signal = zscore_step(
            int(lag), float(threshold), float(influence), new_value,
            list(history) if history is not None else [],
        )
        return (infl, avg, lb, ub, int(signal))

    spark.udf.register(
        "apm_zscore_step",
        _step,
        "struct<infl:double, avg:double, lb:double, ub:double, signal:int>",
    )
