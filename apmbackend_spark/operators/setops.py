"""Ranking and set-operation analytics over the tx stream.

SURVEY.md §2.9 lists ranking window functions and set operations among the
categories the reference does NOT implement; Spark supplies both natively,
and these two operators expose them as first-class queries.

Scale shape:
  * `top_services` — ranking runs AFTER the (server, service) aggregation,
    so the window input is one row per key pair (tiny at any data scale);
    the heavy lifting is a single map-side-combinable groupBy.
  * `account_churn` — EXCEPT DISTINCT compiles to a hash left-anti join on
    the full grouping key; both sides are first reduced to distinct keys
    (map-side combine), so shuffle volume is ∝ distinct accounts, not tx
    volume. The half-way split point is computed in-plan from a 1-row
    aggregate broadcast into the scan — no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_TOP_K = 3


def top_services(tx: DataFrame, k: int = DEFAULT_TOP_K) -> DataFrame:
    """Top-k services per server by total elapsed ms. row_number with a full
    deterministic sort key (total desc, service asc) so ranks are
    tie-stable and engine-identical."""
    agg = tx.groupBy("server", "service").agg(
        F.sum("elapsed").alias("total_ms"),
        F.count(F.lit(1)).alias("n_tx"),
    )
    w = Window.partitionBy("server").orderBy(
        F.col("total_ms").desc(), F.col("service")
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("server", "service", "total_ms", "n_tx", "rnk")
    )


def top_services_oracle_sql(k: int = DEFAULT_TOP_K) -> str:
    return f"""
, agg AS (
    SELECT server, service,
           CAST(SUM(elapsed) AS BIGINT) AS total_ms,
           CAST(COUNT(*) AS BIGINT) AS n_tx
    FROM tx GROUP BY server, service
), ranked AS (
    SELECT server, service, total_ms, n_tx,
           CAST(row_number() OVER (PARTITION BY server
                                   ORDER BY total_ms DESC, service) AS INT) AS rnk
    FROM agg
)
SELECT server, service, total_ms, n_tx, rnk FROM ranked WHERE rnk <= {k}
"""


DEFAULT_SERVICE_A = "S:purchase"
DEFAULT_SERVICE_B = "error"


def account_coverage(
    tx: DataFrame,
    service_a: str = DEFAULT_SERVICE_A,
    service_b: str = DEFAULT_SERVICE_B,
) -> DataFrame:
    """Partition the account universe of two services into a_only / b_only /
    both via the three set operations (EXCEPT each way + INTERSECT),
    labeled and unioned into one result — the "which purchasers hit
    errors" coverage question (EXCEPT/INTERSECT set semantics).

    Compiled as ONE pass: a literal `a.subtract(b) UNION b.subtract(a)
    UNION a.intersect(b)` instantiates each side's scan three times (six
    source scans and three distinct-shuffles per plan); the equivalent
    presence-flag aggregation reads the source once and shuffles one row
    per distinct account, with map-side combine."""
    flagged = (
        tx.where(
            F.col("acctnum").isNotNull()
            & F.col("service").isin(service_a, service_b)
        )
        .groupBy("acctnum")
        .agg(
            F.max(F.col("service") == service_a).alias("in_a"),
            F.max(F.col("service") == service_b).alias("in_b"),
        )
    )
    return flagged.select(
        F.when(F.col("in_a") & ~F.col("in_b"), F.lit("a_only"))
        .when(F.col("in_b") & ~F.col("in_a"), F.lit("b_only"))
        .otherwise(F.lit("both"))
        .alias("op"),
        "acctnum",
    )


def account_coverage_oracle_sql(
    service_a: str = DEFAULT_SERVICE_A, service_b: str = DEFAULT_SERVICE_B
) -> str:
    return f"""
, a AS (SELECT acctnum FROM tx WHERE service = '{service_a}' AND acctnum IS NOT NULL),
  b AS (SELECT acctnum FROM tx WHERE service = '{service_b}' AND acctnum IS NOT NULL)
SELECT 'a_only' AS op, acctnum FROM (SELECT acctnum FROM a EXCEPT SELECT acctnum FROM b)
UNION ALL
SELECT 'b_only' AS op, acctnum FROM (SELECT acctnum FROM b EXCEPT SELECT acctnum FROM a)
UNION ALL
SELECT 'both' AS op, acctnum FROM (SELECT acctnum FROM a INTERSECT SELECT acctnum FROM b)
"""
