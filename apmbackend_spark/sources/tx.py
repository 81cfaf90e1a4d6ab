"""Deterministic mapping from the driver's ``events`` table to the engine's
``tx`` (transaction) stream shape (FIXTURES.md F-1; reference record type at
``entries.js:1-43``).

The mapping is defined ONCE, twice-rendered: `tx_from_events` builds the
Spark DataFrame and `TX_SQL` is the character-equivalent DuckDB CTE, so the
Spark queries and their DuckDB oracles can never drift.

Mapping (all arithmetic chosen to be bit-deterministic across engines):
  server   = 'srv' || (user_id % 4)            -- small dim, 4 hosts
  service  = event_type, with 'S:' prefix for signup/purchase (toplevel
             services, reference stream_parse_transactions.js:390,407)
  logid    = cast(event_id as string)
  acctnum  = NULL when event_id % 7 = 0 else 100000000 + user_id  (~14% null,
             the unenriched fraction, reference :226-239)
  endts    = epoch millis of ts (floor)
  elapsed  = round(value * 100) ms — an exact integer, so every SUM/AVG over
             it is order-independent in IEEE double (< 2^53)
  startts  = NULL when event_id % 20 = 0 else endts - elapsed  (~5% null
             pre-backfill, reference :276-279)
  toplevel = 'Y' iff service starts with 'S:' (reference :258,282)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

# DuckDB CTE body; registered view `events` is the input.
TX_SQL = """
SELECT
    'srv' || CAST(user_id % 4 AS VARCHAR) AS server,
    CASE WHEN event_type IN ('signup', 'purchase') THEN 'S:' || event_type
         ELSE event_type END AS service,
    CAST(event_id AS VARCHAR) AS logid,
    CASE WHEN event_id % 7 = 0 THEN NULL
         ELSE 100000000 + user_id END AS acctnum,
    CASE WHEN event_id % 20 = 0 THEN NULL
         ELSE epoch_ms(ts) - CAST(round(value * 100, 0) AS BIGINT) END AS startts,
    epoch_ms(ts) AS endts,
    CAST(round(value * 100, 0) AS BIGINT) AS elapsed,
    CASE WHEN event_type IN ('signup', 'purchase') THEN 'Y' ELSE 'N' END AS toplevel
FROM events
"""

# Prefix for oracle queries that consume tx.
TX_CTE = f"WITH tx AS ({TX_SQL})"


def _ts_exprs(events: DataFrame) -> tuple[Column, Column]:
    """(endts epoch-ms BIGINT, endtime TimestampType) from the fixture `ts`,
    whatever physical shape it arrives in:

    * BIGINT        — nanos epoch (legacy fixtures read under
      spark.sql.legacy.parquet.nanosAsLong): floor-divide, matching
      DuckDB's ns->us->ms truncation chain.
    * TIMESTAMP     — parquet micros: unix_millis reads the internal epoch
      micros directly (no session-TZ shift on the parquet read path), so it
      is bit-identical to DuckDB's epoch_ms over the same file.
    * TIMESTAMP_NTZ — naive-as-UTC under the engine's UTC session contract
      (loaders.ensure_session_conf); cast then as TIMESTAMP.
    """
    t = events.schema["ts"].dataType
    if isinstance(t, LongType):
        return F.expr("ts DIV 1000000"), F.timestamp_micros(F.expr("ts DIV 1000"))
    ts = F.col("ts")
    if isinstance(t, TimestampNTZType):
        ts = ts.cast("timestamp")
    return F.unix_millis(ts), ts


def tx_from_events(events: DataFrame) -> DataFrame:
    """Spark rendering of TX_SQL. Keeps an extra `endtime` TimestampType
    column (not part of the wire schema) for window() operators; `ts`
    handling is schema-dispatched (see _ts_exprs).
    """
    elapsed = F.round(F.col("value") * F.lit(100), 0).cast("long")
    endts, endtime = _ts_exprs(events)
    service = F.when(
        F.col("event_type").isin("signup", "purchase"),
        F.concat(F.lit("S:"), F.col("event_type")),
    ).otherwise(F.col("event_type"))
    return events.select(
        F.concat(F.lit("srv"), (F.col("user_id") % 4).cast("string")).alias("server"),
        service.alias("service"),
        F.col("event_id").cast("string").alias("logid"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("long"))
        .otherwise(F.lit(100000000) + F.col("user_id"))
        .alias("acctnum"),
        F.when(F.col("event_id") % 20 == 0, F.lit(None).cast("long"))
        .otherwise(endts - elapsed)
        .alias("startts"),
        endts.alias("endts"),
        elapsed.alias("elapsed"),
        F.when(F.col("event_type").isin("signup", "purchase"), F.lit("Y"))
        .otherwise(F.lit("N"))
        .alias("toplevel"),
        endtime.alias("endtime"),
    )


def load_tx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apmbackend_spark.sources.loaders import load_table, spread

    # spread: the events fixture is a single-row-group file (1-task scan);
    # fan raw events wide so the first map stage (projection + bucket
    # partial aggregation) parallelizes. No-op on a many-file lake.
    return tx_from_events(spread(load_table(spark, sf_dir, "events")))
