"""Date-partitioned parquet layout: partition pruning + retention.

The reference keeps its Postgres tables trimmed by a yyyymmdd retention
number (``util_methods.js:178-182`` convertDateToYYYYMMDDNumber, used for
log/table retention). The lake-native equivalent is directory partitioning
by that same integer: `partitionBy("log_date")` at write time makes

  * time-sliced reads partition-PRUNED — a one-day query on a 30-day,
    100 TB fact table lists and scans 1/30th of the files; the filter shows
    up as PartitionFilters on the scan, never touching row data
    (asserted in tests/test_partitioned.py), and
  * retention a metadata operation — dropping day N is deleting one
    directory, not a DELETE scan.

Hygiene at scale: partition count = days, bounded and low-cardinality (the
anti-pattern is partitioning by a high-cardinality key); within a
partition, files stay row-grouped for predicate pushdown on the remaining
columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apmbackend_spark.functions.scalars import yyyymmdd_int, yyyymmdd_int_sql

DEFAULT_ROOT = "/tmp/apmbackend_spark_partitioned"

# Fixture events span 2024-01-01..2024-01-30 at every SF; a mid-range day
# keeps the slice non-empty everywhere.
DEFAULT_DAY = 20240105


def write_partitioned_by_day(
    tx: DataFrame, name: str, root: str = DEFAULT_ROOT, files_per_day: int = 1
) -> str:
    """tx + derived log_date partition column, one directory per day.

    File-count hygiene: without the pre-write repartition every scan task
    writes one file into every day directory it touches — tasks × days
    small files (900 on the 32-core/30-day fixture), which slows the write
    (file-open/commit overhead) and the later reads (file listing). The
    hash repartition on (log_date, shard) bounds output to files_per_day
    per directory; raise files_per_day at scale so each file stays in the
    ~128 MB–1 GB band rather than collapsing a 100 TB day to one writer."""
    path = os.path.join(root, name)
    part = tx.withColumn("log_date", yyyymmdd_int(F.col("endts")))
    if files_per_day == 1:
        part = part.repartition(F.col("log_date"))
    else:
        part = part.repartition(
            F.col("log_date"), F.pmod(F.xxhash64(*tx.columns), F.lit(files_per_day))
        )
    part.write.mode("overwrite").partitionBy("log_date").parquet(path)
    return path


def _token(sf_dir: str) -> str:
    return "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))


# write-once-per-process memo: daily_slice_rollup and dpp_week_rollup read
# the SAME partitioned fact layout; within one session (bench, tests) the
# second gate reuses the first's write instead of re-shuffling the full
# fact table. Keyed by sf_dir; deliberately NOT persisted across processes
# (a stale on-disk layout from an older fixture must not be trusted).
_WRITTEN_FACTS: dict[str, str] = {}


def _partitioned_fact_path(spark: SparkSession, sf_dir: str) -> str:
    from apmbackend_spark.sources.tx import load_tx

    if sf_dir not in _WRITTEN_FACTS:
        _WRITTEN_FACTS[sf_dir] = write_partitioned_by_day(
            load_tx(spark, sf_dir).select("server", "service", "endts", "elapsed"),
            f"tx_{_token(sf_dir)}",
        )
    return _WRITTEN_FACTS[sf_dir]


def daily_slice_rollup(
    spark: SparkSession, sf_dir: str, day: int = DEFAULT_DAY
) -> DataFrame:
    """Per-service traffic/latency for ONE day, read through the
    date-partitioned layout: the day filter prunes partitions (metadata
    only), so the scan touches 1/30th of the lake."""
    path = _partitioned_fact_path(spark, sf_dir)
    day_df = spark.read.parquet(path).where(F.col("log_date") == day)
    return day_df.groupBy("server", "service").agg(
        F.count(F.lit(1)).alias("n_tx"),
        F.sum("elapsed").alias("total_ms"),
        (F.sum("elapsed").cast("double") / F.count(F.lit(1))).alias("avg_ms"),
    )


def daily_slice_rollup_oracle_sql(day: int = DEFAULT_DAY) -> str:
    return f"""
SELECT server, service,
       CAST(COUNT(*) AS BIGINT) AS n_tx,
       CAST(SUM(elapsed) AS BIGINT) AS total_ms,
       CAST(SUM(elapsed) AS DOUBLE) / COUNT(*) AS avg_ms
FROM tx
WHERE {yyyymmdd_int_sql('endts')} = {day}
GROUP BY server, service
"""


# ---------------------------------------------------------------------------
# Dynamic partition pruning: the day filter arrives THROUGH a dim join.
# ---------------------------------------------------------------------------

# Calendar-week dim over the fixture span (2024-01-01..30): week w covers
# days 7w+1 .. 7w+7. Week 1 = Jan 8..14.
DPP_WEEK = 1


def _week_dim(spark: SparkSession, year_month: int = 202401):
    """Tiny in-plan calendar dim: (log_date, week). Arithmetic-only so the
    oracle can spell the same membership as a BETWEEN predicate."""
    return spark.range(1, 31).select(
        (F.lit(year_month * 100) + F.col("id")).cast("int").alias("log_date"),
        ((F.col("id") - 1) / 7).cast("int").alias("week"),
    )


def dpp_week_rollup(
    spark: SparkSession, sf_dir: str, week: int = DPP_WEEK
) -> DataFrame:
    """Per-service rollup for one calendar WEEK where the fact scan learns
    its day list at RUNTIME through the dim join — dynamic partition
    pruning, the lake-scale pattern for `fact JOIN filtered_dim` when the
    filter is on a dim attribute (here `week`) rather than the partition
    key itself. Catalyst plants a dynamicpruningexpression subquery on the
    fact's partition column (asserted in tests/test_partitioned_skew.py):
    the broadcast dim's log_date values prune the partitioned scan to 7 of
    30 day directories before any fact row is read — static pruning can't
    do this, and a naive plan scans the full table. At 100 TB the scan-side
    saving is the whole point of keying facts by the dim's join column."""
    facts = spark.read.parquet(_partitioned_fact_path(spark, sf_dir))
    dim = _week_dim(spark).where(F.col("week") == int(week))
    return (
        facts.join(F.broadcast(dim), "log_date")
        .groupBy("server", "service")
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.sum("elapsed").alias("total_ms"),
            (F.sum("elapsed").cast("double") / F.count(F.lit(1))).alias("avg_ms"),
        )
    )


def dpp_week_rollup_oracle_sql(week: int = DPP_WEEK) -> str:
    lo = 20240100 + 7 * int(week) + 1
    hi = 20240100 + 7 * int(week) + 7
    return f"""
SELECT server, service,
       CAST(COUNT(*) AS BIGINT) AS n_tx,
       CAST(SUM(elapsed) AS BIGINT) AS total_ms,
       CAST(SUM(elapsed) AS DOUBLE) / COUNT(*) AS avg_ms
FROM tx
WHERE {yyyymmdd_int_sql('endts')} BETWEEN {lo} AND {hi}
GROUP BY server, service
"""
