"""Schema-evolution ingest: mergeSchema over heterogeneous parquet
generations.

A long-lived lake accumulates parquet written under several schema
generations — columns appear, old files never get rewritten. The reference
hits the same problem at parse level (its BAF salvage and `toplevel`
backfill exist because log lines change shape mid-stream,
``stream_parse_transactions.js:31-35``); on a lake the engine-level answer
is Spark's ``mergeSchema`` read: one logical table over all generations,
absent columns surfacing as NULLs, with the generation recoverable from
the partition directory.

The gate materializes two real generations of the orders fact under a
hive-style ``gen=N`` layout — gen 1 (orders before SPLIT_DATE) WITHOUT the
``o_orderpriority`` column, gen 2 (the rest) with it — then reads the root
back with ``mergeSchema=true`` and emits the normalized union plus
per-generation null accounting. The oracle replays the split directly from
``orders``, so the graded claim is: the merged read loses nothing,
invents nothing, and NULLs exactly the absent column of the old
generation.

Scale note: ``mergeSchema`` costs one footer read per file at planning
time (not a data scan); on a 100 TB lake you bound it by reading a
representative file per partition or by carrying the merged schema in a
catalog — the read path itself (per-file projection adapting to the
file's own physical schema) is exactly what this gate exercises.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apmbackend_spark.sources.loaders import load_table

SPLIT_DATE = "1998-01-01"
DEFAULT_ROOT = "/tmp/apmbackend_spark_evolution"

# process-local write-once cache, keyed by sf_dir (the partitioned.py idiom)
_WRITTEN: dict[str, str] = {}


def _token(sf_dir: str) -> str:
    return "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))


def write_generations(
    spark: SparkSession, sf_dir: str, root: str | None = None
) -> str:
    """Materialize the two schema generations under ``<root>/gen=N``."""
    base = os.path.join(root or DEFAULT_ROOT, f"orders_{_token(sf_dir)}")
    if _WRITTEN.get(sf_dir) == base:
        return base
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(SPLIT_DATE).cast("timestamp")
    old = orders.where(F.col("o_orderdate") < split).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    new = orders.where(F.col("o_orderdate") >= split).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    old.write.mode("overwrite").parquet(os.path.join(base, "gen=1"))
    new.write.mode("overwrite").parquet(os.path.join(base, "gen=2"))
    _WRITTEN[sf_dir] = base
    return base


def schema_merge_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graded read: mergeSchema over both generations, normalized
    union with the generation as a recovered partition column."""
    base = write_generations(spark, sf_dir)
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", base)
        .parquet(base)
    )
    return merged.select(
        F.col("o_orderkey"),
        F.col("gen").cast("int").alias("gen"),
        F.col("o_custkey"),
        F.col("o_totalprice"),
        # gen-1 files have no such column: mergeSchema surfaces NULL
        F.col("o_orderpriority"),
        F.col("o_orderpriority").isNull().alias("pre_evolution"),
    )


def schema_merge_ingest_oracle_sql() -> str:
    return f"""
SELECT o_orderkey,
       CASE WHEN o_orderdate < TIMESTAMP '{SPLIT_DATE}' THEN 1 ELSE 2 END
           AS gen,
       o_custkey,
       o_totalprice,
       CASE WHEN o_orderdate >= TIMESTAMP '{SPLIT_DATE}'
            THEN o_orderpriority END AS o_orderpriority,
       o_orderdate < TIMESTAMP '{SPLIT_DATE}' AS pre_evolution
FROM orders
"""
