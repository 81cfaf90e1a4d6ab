"""Event-time ordered release + fan-in union (SURVEY.md O1, F9, §2.9;
reference ``binary_heap.js:1-127``, ``stream_calc_stats.js:136-155``,
``stream_insert_db.js:120-160``).

The reference keeps a min-heap of tx ordered by endts and drains it in order
as the event-time frontier advances; all record types fan into one db_insert
queue. In Spark the heap is simply a global ORDER BY (range-partitioned
sample sort — scales out, unlike a single-process heap), and the fan-in is a
UNION of type-tagged envelopes.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ordered_release(tx: DataFrame) -> DataFrame:
    """O1: tx in endts order with a deterministic release rank. Ties broken
    by logid (the reference's heap is insertion-stable; batch needs an
    explicit total order).

    Scale shape: a bare ``Window.orderBy`` funnels the whole dataset through
    ONE task for row_number — the canonical driver-of-one bottleneck.
    Instead: range-partition on the sort key (sample sort, so partition i's
    keys all precede partition i+1's), rank WITHIN each partition in
    parallel, then add per-partition offsets (the running row count of the
    preceding partitions — the zipWithIndex pattern). The only
    single-partition exchange left operates on |partitions| count rows, not
    on the data."""
    df = tx.select("logid", "server", "service", "endts", "elapsed")
    rng = df.repartitionByRange(F.col("endts"), F.col("logid"))
    # persist: `part` feeds both the rank pass and the per-partition counts;
    # without it the upstream tx derivation + range shuffle run twice
    part = rng.withColumn("__pid", F.spark_partition_id()).persist()
    wp = Window.partitionBy("__pid").orderBy("endts", "logid")
    local = part.withColumn("__lrn", F.row_number().over(wp))
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    wo = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(wo), F.lit(0)).alias("__off"),
    )
    return local.join(F.broadcast(offsets), "__pid").select(
        "logid",
        "server",
        "service",
        "endts",
        "elapsed",
        (F.col("__off") + F.col("__lrn")).cast("int").alias("release_rank"),
    )


ORDERED_RELEASE_ORACLE = """
SELECT logid, server, service, endts, elapsed,
       CAST(ROW_NUMBER() OVER (ORDER BY endts, logid) AS INT) AS release_rank
FROM tx
"""


def db_fanin(frames: dict[str, DataFrame]) -> DataFrame:
    """§2.9 db_insert fan-in: union type-tagged envelopes
    (rectype, ts, server, service). Accepts any map of rectype ->
    DataFrame with (ts, server, service) columns."""
    parts = []
    for rectype, df in frames.items():
        parts.append(
            df.select(
                F.lit(rectype).alias("rectype"),
                F.col("ts").cast("long").alias("ts"),
                F.col("server"),
                F.col("service"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), parts)
