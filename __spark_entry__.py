"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` maps
operator names (SURVEY.md §2) to (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` supplies the DuckDB twin for each SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from apmbackend_spark.sources.tx import TX_CTE, load_tx
from apmbackend_spark.operators.window_stats import (
    window_stats,
    window_stats_oracle_sql,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sliding-window stats (A1-A5) over the tx stream."""
    tx = load_tx(spark, "/root/testdata/sf0.001")
    return window_stats(tx)


def _q_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return window_stats(load_tx(spark, sf_dir))


def _q_tx_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P5-P7 + U9: the tx projection itself (service normalization, toplevel
    # derivation, startts back-fill) as a checkable query.
    from pyspark.sql import functions as F

    tx = load_tx(spark, sf_dir)
    return tx.select(
        "server",
        "service",
        "logid",
        "acctnum",
        F.coalesce(F.col("startts"), F.col("endts") - F.col("elapsed")).alias("startts"),
        "endts",
        "elapsed",
        "toplevel",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tx_normalize": _q_tx_normalize,
        "window_stats": _q_window_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tx_normalize": TX_CTE
        + """
SELECT server, service, logid, acctnum,
       COALESCE(startts, endts - elapsed) AS startts,
       endts, elapsed, toplevel
FROM tx
""",
        "window_stats": TX_CTE + window_stats_oracle_sql(),
    }
