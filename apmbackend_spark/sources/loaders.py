"""Batch parquet loaders for the driver test tables.

All timestamps are also exposed as epoch-millis longs so query outputs are
engine-portable (a raw TIMESTAMP column hashes differently across engines;
a BIGINT does not).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime-settable confs required to read the driver fixtures on ANY session,
# not just the tuned one from session.get_spark():
#   - some fixture generations carry events.ts as INT64 TIMESTAMP(NANOS),
#     which Spark's parquet reader rejects (PARQUET_TYPE_ILLEGAL) unless
#     read as a nanos BIGINT (current fixtures are timestamp[us]; the conf
#     is harmless there and tx_from_events dispatches on the actual type);
#   - ms/us parquet timestamps must infer as TimestampType (not NTZ) so
#     unix_millis()/window() resolve uniformly;
#   - UTC session time keeps epoch math identical to the DuckDB oracle.
_SESSION_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Idempotently apply the fixture-compat confs to a live session.

    The driver calls ``queries()`` with a vanilla SparkSession; these confs
    are all runtime-settable, so setting them here (rather than only at
    builder time in session.get_spark) makes every loader portable.
    """
    for key, value in _SESSION_CONF.items():
        if spark.conf.get(key, None) != value:
            spark.conf.set(key, value)
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_session_conf(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Small-input ingest guard: parquet scan parallelism is bounded by row
    groups, so a single-row-group file (the fixture layout) scans as ONE
    task — and every per-row expression before the first shuffle (tokenize,
    shingle explode, hashing) runs single-threaded behind it. When the scan
    has fewer partitions than the cluster's parallelism, round-robin
    repartition the (small, by construction) raw rows so the heavy
    stage runs wide; when the input is already parallel — the real
    many-file lake at scale — this is a no-op, so no shuffle is added
    where it would actually hurt."""
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    # file count as the parallelism proxy (already computed by the scan's
    # file index — no second planning pass the way .rdd.getNumPartitions()
    # would force): a many-file lake has files >= cores and no-ops here
    try:
        n_inputs = len(df.inputFiles())
    except Exception:  # non-file-backed frame: nothing to widen
        return df
    if 0 < n_inputs < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (mirrors the driver's DuckDB
    side, which pre-registers the same names)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
