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
import shutil

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


# ---------------------------------------------------------------------------
# Partition-level copy-on-write MERGE (lake upsert without a table format)
# ---------------------------------------------------------------------------

MERGE_UPDATE_DAY = 20240105   # updates + deletes target this partition
MERGE_INSERT_DAY = 20240131   # inserts create this (previously absent) one
_MERGE_SHIFT_MS = 26 * 24 * 3600 * 1000  # Jan 5 + 26 days = Jan 31


def merge_upsert_day(
    spark: SparkSession, sf_dir: str, path: str | None = None
) -> DataFrame:
    """MERGE against the date-partitioned lake the way plain parquet does it
    at scale: copy-on-write at PARTITION granularity. The changeset touches
    two days — update/delete rows on Jan 5, insert a new Jan 31 partition —
    so the merge job reads and rewrites exactly those two directories
    (partition-pruned read + ``partitionOverwriteMode=dynamic`` write) and
    never touches the other 29. This is the pre-table-format upsert pattern
    (Hive-style dynamic partition overwrite); Delta/Iceberg refine the
    granularity to files, but the plan shape — prune to affected data,
    rewrite, swap — is the same, and at 100 TB the pruning IS the merge's
    cost model.

    Deterministic changeset (so the gate is hash-gradeable):
      * UPDATE: Jan 5 rows get elapsed += 1000
      * DELETE: Jan 5 'click' rows are removed
      * INSERT: every Jan 5 row re-keyed 26 days later (the new Jan 31
        partition), elapsed += 7

    Returns the post-merge per-day rollup (the whole table, proving the
    untouched partitions still read back exactly).

    ``path``: merge into an existing layout instead of (re)building the
    private copy — lets tests snapshot the base BEFORE the merge. The
    default rebuild-per-call keeps the graded gate self-contained and
    idempotent (its cost is the gate's setup, not the merge: the merge
    itself touches 2 of 31 directories regardless of table size)."""
    from apmbackend_spark.sources.tx import load_tx

    if path is None:
        # private layout copy: the memoized shared path must stay immutable
        # (daily_slice_rollup / dpp_week_rollup read it in the same process)
        path = write_partitioned_by_day(
            load_tx(spark, sf_dir).select("server", "service", "endts", "elapsed"),
            f"tx_merge_{_token(sf_dir)}",
        )
    facts = spark.read.parquet(path)

    upd_day, ins_day = MERGE_UPDATE_DAY, MERGE_INSERT_DAY
    # pruned read: ONLY the update-day partition feeds the rewrite
    affected = facts.where(F.col("log_date") == upd_day)
    updated = (
        affected.where(F.col("service") != "click")  # DELETE
        .withColumn("elapsed", F.col("elapsed") + F.lit(1000))  # UPDATE
    )
    inserted = affected.select(
        "server",
        "service",
        (F.col("endts") + F.lit(_MERGE_SHIFT_MS)).alias("endts"),
        (F.col("elapsed") + F.lit(7)).alias("elapsed"),
        F.lit(ins_day).alias("log_date"),
    )
    # two-phase commit, the same shape a table format uses: WRITE the
    # replacement rows to a staging location first (Spark — correctly —
    # refuses a job that reads and overwrites one path; a file-level CoW
    # engine stages new files for the same reason), then swap them in with
    # a dynamic partition overwrite that touches ONLY the staged days.
    staging = path + "_staging"
    (
        updated.select("server", "service", "endts", "elapsed", "log_date")
        .unionByName(inserted)
        .repartition(F.col("log_date"))
        .write.mode("overwrite")
        .parquet(staging)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            spark.read.parquet(staging)
            .write.mode("overwrite")
            .partitionBy("log_date")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(staging, ignore_errors=True)
    return (
        spark.read.parquet(path)
        .groupBy("log_date")
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.sum("elapsed").alias("total_ms"),
        )
    )


def merge_upsert_day_oracle_sql() -> str:
    # rendered as CTE continuations: the caller prepends TX_CTE ("WITH tx
    # AS (...)"), so this fragment must NOT open its own WITH
    upd, ins = MERGE_UPDATE_DAY, MERGE_INSERT_DAY
    day = yyyymmdd_int_sql("endts")
    return f"""
, base AS (
    SELECT server, service, endts, elapsed, {day} AS log_date FROM tx
), merged AS (
    SELECT server, service, endts,
           CASE WHEN log_date = {upd} THEN elapsed + 1000 ELSE elapsed END AS elapsed,
           log_date
    FROM base
    WHERE NOT (log_date = {upd} AND service = 'click')
    UNION ALL
    SELECT server, service, endts + {_MERGE_SHIFT_MS} AS endts,
           elapsed + 7 AS elapsed, {ins} AS log_date
    FROM base WHERE log_date = {upd}
)
SELECT log_date,
       CAST(COUNT(*) AS BIGINT) AS n_tx,
       CAST(SUM(elapsed) AS BIGINT) AS total_ms
FROM merged
GROUP BY log_date
"""


RETENTION_CUTOFF_DAY = 20240110


def retention_sweep(
    spark: SparkSession,
    sf_dir: str,
    cutoff_day: int = RETENTION_CUTOFF_DAY,
    path: str | None = None,
) -> DataFrame:
    """Graded retention composition: build the date-partitioned lake, run
    the metadata-only ``drop_partitions_before`` sweep (reference
    semantics: yyyymmdd retention number, util_methods.js:178-182), then
    roll up the ENTIRE surviving table per day — proving the drop removed
    exactly the expired directories and left every surviving day readable
    byte-for-byte (the oracle filters the same cutoff out of the raw tx
    stream; any over- or under-deletion breaks the value hash).

    Uses a PRIVATE layout copy (rebuilt per call, like merge_upsert_day)
    so the memoized shared fact layout other gates read stays immutable;
    the sweep itself deletes 9 of 30 day directories with zero data scan —
    at 100 TB its cost is directory metadata, not volume."""
    from apmbackend_spark.sources.tx import load_tx

    if path is None:
        path = write_partitioned_by_day(
            load_tx(spark, sf_dir).select("server", "service", "endts", "elapsed"),
            f"tx_retention_{_token(sf_dir)}",
        )
    drop_partitions_before(path, int(cutoff_day))
    return (
        spark.read.parquet(path)
        .groupBy("log_date")
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.sum("elapsed").alias("total_ms"),
            F.min("endts").alias("min_endts"),
            F.max("endts").alias("max_endts"),
        )
    )


def retention_sweep_oracle_sql(cutoff_day: int = RETENTION_CUTOFF_DAY) -> str:
    day = yyyymmdd_int_sql("endts")
    return f"""
SELECT {day} AS log_date,
       CAST(COUNT(*) AS BIGINT) AS n_tx,
       CAST(SUM(elapsed) AS BIGINT) AS total_ms,
       MIN(endts) AS min_endts,
       MAX(endts) AS max_endts
FROM tx
WHERE {day} >= {int(cutoff_day)}
GROUP BY {day}
"""


def drop_partitions_before(path: str, cutoff_day: int) -> list[int]:
    """Retention as a METADATA operation (the point of the date-partitioned
    layout; the reference trims by yyyymmdd retention number,
    util_methods.js:178-182): dropping expired days = deleting their
    directories. No DELETE scan, no rewrite, cost independent of data
    volume. Returns the dropped day numbers."""
    import glob

    dropped = []
    for day_dir in glob.glob(os.path.join(path, "log_date=*")):
        try:
            day = int(day_dir.rsplit("=", 1)[-1])
        except ValueError:
            continue
        if day < int(cutoff_day):
            # no ignore_errors: a failed delete (open handle, permissions)
            # must surface, not report the partition as dropped while its
            # data still scans
            shutil.rmtree(day_dir)
            dropped.append(day)
    return sorted(dropped)
