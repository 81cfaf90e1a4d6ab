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
    window_stats_oracle_ctes,
    window_stats_oracle_sql,
)
from apmbackend_spark.operators import zscore as zs
from apmbackend_spark.operators import alerts as al
from apmbackend_spark.operators import correlation as co
from apmbackend_spark.operators import ordering as od

ZSCORE_LAGS = (60, 360)
ZSCORE_THRESHOLD = 3.0

# Exercises every predicate on the fixture data: hard-max fires on the
# latency tail, the override rebases one service, both-signals pass the
# floors, one service suppressed (F1), one no-op suppressed lag.
ALERT_CFG = al.AlertConfig(
    hard_max_ms=20000.0,
    hard_min_ms=200.0,
    min_tpm=0.1,
    alert_on_both_only=True,
    suppressed_lags=(8640,),
    suppressed_services=("click",),
    hard_max_overrides={"error": 15000.0},
    window_size=6,
    required_bad=3,
    cooldown_minutes=60.0,
)


def _fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = zs.st_from_window_stats(window_stats(load_tx(spark, sf_dir)))
    return zs.zscore_window(st, lags=ZSCORE_LAGS, threshold=ZSCORE_THRESHOLD)


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


def _q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = zs.st_from_window_stats(window_stats(load_tx(spark, sf_dir)))
    return zs.zscore_window(st, lags=ZSCORE_LAGS, threshold=ZSCORE_THRESHOLD)


def _q_zscore_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact reference semantics incl. influence damping (recursive state,
    # not SQL-expressible) — rows-only driver check; unit-tested against a
    # step-by-step simulation in tests/test_zscore.py.
    st = zs.st_from_window_stats(window_stats(load_tx(spark, sf_dir)))
    return zs.zscore_recursive(
        st, lags=ZSCORE_LAGS, threshold=ZSCORE_THRESHOLD, influence=0.1
    )


def _q_alert_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return al.alert_candidates(_fs(spark, sf_dir), ALERT_CFG)


def _q_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full F1-F6 pipeline incl. recursive debounce + cooldown — rows-only
    # driver check; trace semantics unit-tested in tests/test_alerts.py.
    return al.alert_pipeline(_fs(spark, sf_dir), ALERT_CFG)


def _q_correlate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = load_tx(spark, sf_dir)
    return co.correlate(co.entry_leg(tx), co.exit_leg(tx))


def _q_acct_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return co.acct_enrich(load_tx(spark, sf_dir))


def _q_ordered_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    return od.ordered_release(load_tx(spark, sf_dir))


def _q_db_fanin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    tx = load_tx(spark, sf_dir)
    st = zs.st_from_window_stats(window_stats(tx))
    fs = zs.zscore_window(st, lags=ZSCORE_LAGS, threshold=ZSCORE_THRESHOLD)
    cand = al.alert_candidates(fs, ALERT_CFG)
    return od.db_fanin(
        {
            "tx": tx.withColumn("ts", F.col("endts")),
            "st": st.withColumn("ts", F.col("timestamp")),
            "fs": fs.withColumn("ts", F.col("timestamp")),
            "al": cand.withColumn("ts", F.col("timestamp")),
        }
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tx_normalize": _q_tx_normalize,
        "window_stats": _q_window_stats,
        "zscore": _q_zscore,
        "zscore_recursive": _q_zscore_recursive,
        "alert_candidates": _q_alert_candidates,
        "alerts": _q_alerts,
        "correlate": _q_correlate,
        "acct_enrich": _q_acct_enrich,
        "ordered_release": _q_ordered_release,
        "db_fanin": _q_db_fanin,
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
        "zscore": TX_CTE
        + window_stats_oracle_ctes()
        + zs.ST_ORACLE_CTE
        + zs.zscore_oracle_select(lags=ZSCORE_LAGS, threshold=ZSCORE_THRESHOLD),
        "alert_candidates": TX_CTE
        + window_stats_oracle_ctes()
        + zs.ST_ORACLE_CTE
        + ", fs AS ("
        + zs.zscore_oracle_select(lags=ZSCORE_LAGS, threshold=ZSCORE_THRESHOLD)
        + ")"
        + al.alert_candidates_oracle_select(ALERT_CFG),
        "correlate": TX_CTE + co.CORRELATE_ORACLE,
        "acct_enrich": TX_CTE + co.ACCT_ENRICH_ORACLE,
        "ordered_release": TX_CTE + od.ORDERED_RELEASE_ORACLE,
        "db_fanin": TX_CTE
        + window_stats_oracle_ctes()
        + zs.ST_ORACLE_CTE
        + ", fs AS ("
        + zs.zscore_oracle_select(lags=ZSCORE_LAGS, threshold=ZSCORE_THRESHOLD)
        + "), cand AS ("
        + al.alert_candidates_oracle_select(ALERT_CFG)
        + """)
SELECT 'tx' AS rectype, endts AS ts, server, service FROM tx
UNION ALL SELECT 'st' AS rectype, timestamp AS ts, server, service FROM st
UNION ALL SELECT 'fs' AS rectype, timestamp AS ts, server, service FROM fs
UNION ALL SELECT 'al' AS rectype, timestamp AS ts, server, service FROM cand
""",
    }
