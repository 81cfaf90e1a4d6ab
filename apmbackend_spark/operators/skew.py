"""Skew mitigation for hot join keys: explicit salting.

The APM workload is key-skewed by construction — a handful of services
(`S:purchase`, toplevel entries) carry most of the traffic, so a shuffle
join on (server, service) sends the hot key's entire fact volume to one
task. Two engine answers exist:

  * AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
    session.get_spark) — runtime splitting of oversized partitions; free,
    but only kicks in above size thresholds and only for sort-merge joins.
  * Explicit salting (this module) — deterministic fan-out of the dim side
    x n_salts and hash-assignment of each fact row to one replica, so the
    hot key spreads over n_salts tasks REGARDLESS of join strategy. The
    salt derives from a stable row column (not rand()), so results are
    reproducible and oracle-checkable: the salt provably never changes the
    join result, only its partitioning.

Use the explicit form when a key's volume is structurally hot (known
tenant/service), AQE when skew is incidental.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    salt_source: Column,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Join facts to a (small-ish, per-key-unique) dim on `keys`, salted:
    dim rows are replicated n_salts times (explode, cheap — dim rows only),
    facts pick replica pmod(hash(salt_source), n_salts). The shuffle then
    keys on (keys..., salt): a key hot enough to swamp one task now lands
    on n_salts tasks. Output columns = facts' + dim's non-key columns.

    Only inner/left(-outer)/left_semi/left_anti survive salting: a dim key
    unmatched by any fact has n_salts replicas and a right/full outer join
    would emit every one of them as a separate null-padded row."""
    if how.lower().replace("_", "").replace("outer", "") not in {
        "inner", "left", "leftsemi", "leftanti", "semi", "anti"
    }:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched dim rows are "
            f"replicated n_salts times under right/full outer semantics"
        )
    salted_dim = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(int(n_salts) - 1))),
    )
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.hash(salt_source), F.lit(int(n_salts)))
    )
    return salted_facts.join(salted_dim, [*keys, "__salt"], how).drop("__salt")


def skew_salted_profile(spark, sf_dir: str, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """tx enriched with its (server, service) traffic profile through the
    salted join — same semantics as a plain key join (the oracle is the
    plain SQL join), different physical distribution: the hot service's
    rows spread across n_salts shuffle partitions."""
    from apmbackend_spark.sources.tx import load_tx

    tx = load_tx(spark, sf_dir).select("logid", "server", "service", "elapsed")
    profile = tx.groupBy("server", "service").agg(
        F.count(F.lit(1)).alias("key_n"),
        F.sum("elapsed").alias("key_total_ms"),
    )
    key_avg = F.col("key_total_ms").cast("double") / F.col("key_n")
    joined = salted_join(
        tx, profile, ["server", "service"], F.col("logid"), n_salts
    )
    return joined.select(
        "logid",
        "server",
        "service",
        "elapsed",
        key_avg.alias("key_avg_ms"),
        (F.col("elapsed").cast("double") > key_avg).alias("above_avg"),
    )


SKEW_SALTED_PROFILE_ORACLE = """
SELECT t.logid, t.server, t.service, t.elapsed,
       p.key_avg_ms,
       CAST(t.elapsed AS DOUBLE) > p.key_avg_ms AS above_avg
FROM tx t
JOIN (
    SELECT server, service,
           CAST(SUM(elapsed) AS DOUBLE) / COUNT(*) AS key_avg_ms
    FROM tx GROUP BY server, service
) p USING (server, service)
"""
