"""Record-type schemas for the engine.

The reference engine (APMBackend) has five hard-coded record types carried as
pipe-delimited CSV between processes (reference ``entries.js:174-193``). Here
they are first-class Spark ``StructType`` schemas; nullability mirrors the
reference's semantics (reference ``stream_parse_transactions.js:31-35``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# tx — one completed service transaction (reference entries.js:1-43).
# Timestamps are epoch-millis longs on the wire; the loaders also expose a
# TimestampType twin column for window operators.
TX_SCHEMA = StructType(
    [
        StructField("server", StringType(), False),
        StructField("service", StringType(), False),
        StructField("logid", StringType(), True),
        StructField("acctnum", LongType(), True),
        StructField("startts", LongType(), True),   # nullable pre-backfill
        StructField("endts", LongType(), False),
        StructField("elapsed", LongType(), False),  # ms
        StructField("toplevel", StringType(), False),  # 'Y' | 'N'
    ]
)

# st — windowed stats per (server, service) (reference entries.js:52-84).
ST_SCHEMA = StructType(
    [
        StructField("timestamp", LongType(), False),
        StructField("server", StringType(), False),
        StructField("service", StringType(), False),
        StructField("tpm", DoubleType(), False),
        StructField("average", DoubleType(), True),  # null when window empty
        StructField("per75", DoubleType(), True),
        StructField("per95", DoubleType(), True),
    ]
)


def _zscore_metric_fields(prefix: str) -> list[StructField]:
    return [
        StructField(prefix, DoubleType(), True),
        StructField(f"{prefix}avg", DoubleType(), True),
        StructField(f"{prefix}lb", DoubleType(), True),
        StructField(f"{prefix}ub", DoubleType(), True),
        StructField(f"{prefix}signal", IntegerType(), False),  # -1 | 0 | 1
    ]


# fs — st + z-score fields, one row per lag (reference entries.js:86-152).
FS_SCHEMA = StructType(
    [
        StructField("timestamp", LongType(), False),
        StructField("server", StringType(), False),
        StructField("service", StringType(), False),
        StructField("tpm", DoubleType(), False),
        StructField("lag", IntegerType(), False),
        *_zscore_metric_fields("average"),
        *_zscore_metric_fields("per75"),
        *_zscore_metric_fields("per95"),
    ]
)

# al — triggered alert (reference entries.js:202-241). The embedded fs entry
# is kept as a nested struct (the reference stores it as jsonb).
ALERT_SCHEMA = StructType(
    [
        StructField("alerttimestamp", LongType(), False),
        StructField("entrytimestamp", LongType(), False),
        StructField("server", StringType(), False),
        StructField("service", StringType(), False),
        StructField("cause", StringType(), False),  # CSV of cause labels
        StructField("entry", FS_SCHEMA, True),
    ]
)

# jx — JVM/host gauge sample (reference entries.js:243-332).
JMX_SCHEMA = StructType(
    [
        StructField("timestamp", LongType(), False),
        StructField("server", StringType(), False),
        StructField("dsinusenodes", IntegerType(), True),
        StructField("dsactivenodes", IntegerType(), True),
        StructField("dsavailablenodes", IntegerType(), True),
        StructField("heapused", LongType(), True),
        StructField("heapcommitted", LongType(), True),
        StructField("heapmax", LongType(), True),
        StructField("metaused", LongType(), True),
        StructField("metacommitted", LongType(), True),
        StructField("metamax", LongType(), True),
        StructField("sysload", DoubleType(), True),
        StructField("classcnt", IntegerType(), True),
        StructField("threadcnt", IntegerType(), True),
        StructField("daemonthreadcnt", IntegerType(), True),
        StructField("beanpoolavailablecnt", IntegerType(), True),
        StructField("beanpoolcurrentsize", IntegerType(), True),
        StructField("beanpoolmaxsize", IntegerType(), True),
    ]
)
