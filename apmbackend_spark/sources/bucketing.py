"""Bucketed parquet tables: the shuffle-elimination path for recurring
joins/aggregations on a stable key.

Why this exists (the 100 TB argument): the APM pipeline joins and
re-aggregates on (server, service) at every stage — stats, z-score, alerts,
enrichment. On a cluster, each of those is a hash-partition shuffle of the
full fact stream. Writing the facts ONCE bucketed by the key makes every
downstream join/groupBy on that key shuffle-free: Spark's scan reports the
bucket layout as the output partitioning, Catalyst sees the join children
already co-partitioned, and the Exchange disappears (asserted in
tests/test_bucketing.py). The reference has no equivalent — its "bucketing"
is the single-process nested dict keyed server->service
(stream_calc_stats.js:124-133); this is that idea made cluster-wide and
persistent.

Mechanics: `bucketBy` requires a catalog table (`saveAsTable`) — Spark's
in-memory session catalog suffices (no Hive metastore needed); data lands as
ordinary parquet at `path`, metadata (bucket spec) lives in the session.
Bucket count is a layout contract: both sides of a co-located join must
agree on (keys, n_buckets).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_ROOT = "/tmp/apmbackend_spark_bucketed"


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: tuple[str, ...],
    n_buckets: int = 8,
    root: str = DEFAULT_ROOT,
) -> str:
    """Persist `df` as a bucketed+sorted parquet table in the session
    catalog; returns the table name. Overwrites any previous layout (drop
    first: saveAsTable refuses to change an existing table's path)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    path = os.path.join(root, name)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .saveAsTable(name)
    )
    return name


def read_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def _table_token(sf_dir: str) -> str:
    return "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))


def bucketed_enrich(spark: SparkSession, sf_dir: str, n_buckets: int = 32) -> DataFrame:
    """Each tx row enriched with its (server, service) traffic profile via a
    CO-LOCATED join: both sides are written bucketed by the key, so the join
    plan has no Exchange on either side (tests/test_bucketing.py asserts
    this). above_avg marks rows slower than their key's mean.

    This is the write-once/join-many pattern: at 100 TB the fact write
    amortizes the single layout shuffle across every downstream key-join,
    where the unbucketed plan pays a full-fact shuffle per query.

    Bucket-count choice: buckets bound BOTH the layout write's parallelism
    and every later bucket-local join's — size to the cluster (here the 32
    local cores; thousands on a real cluster) so neither stage runs
    narrower than the hardware. Empty buckets on the small dim side are
    free (no file is written for an empty bucket)."""
    from pyspark.sql import functions as F

    from apmbackend_spark.sources.tx import load_tx

    tok = _table_token(sf_dir)
    tx = load_tx(spark, sf_dir).select("logid", "server", "service", "elapsed")
    facts = write_bucketed(tx, f"tx_b_{tok}", ("server", "service"), n_buckets)
    profile = tx.groupBy("server", "service").agg(
        F.count(F.lit(1)).alias("key_n"),
        F.sum("elapsed").alias("key_total_ms"),
    )
    dims = write_bucketed(
        profile, f"profile_b_{tok}", ("server", "service"), n_buckets
    )
    f, p = read_table(spark, facts), read_table(spark, dims)
    key_avg = F.col("key_total_ms").cast("double") / F.col("key_n")
    return f.join(p, ["server", "service"]).select(
        "logid",
        "server",
        "service",
        "elapsed",
        key_avg.alias("key_avg_ms"),
        (F.col("elapsed").cast("double") > key_avg).alias("above_avg"),
    )


BUCKETED_ENRICH_ORACLE = """
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
