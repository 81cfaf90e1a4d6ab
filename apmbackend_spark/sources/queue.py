"""Messaging-queue adapter (S3/S4 posture): the reference's wire protocol
over line-based transports.

The reference chains its four processes through RabbitMQ queues whose
messages are pipe-delimited entry lines — `TxEntry.toCSVString()` renders
``tx|server|service|logId|acctNum|startTs|endTs|elapsed|topLevel``
(entries.js:16-21), missing numerics render as the literal ``NaN`` (JS
`parseInt(undefined)`), and `toPostgresObject` maps NaN back to NULL
(entries.js:23-33). Producers buffer + pause on channel backpressure
(queue.js:206-263); consumers ack-on-receive, so delivery is AT-LEAST-ONCE
and a crash between ack and downstream write replays records
(queue.js:266-305).

This module renders that protocol Spark-first:

  * `tx_to_wire` / `wire_to_tx` — the codec as single codegen projections
    (concat_ws / split + casts): encode and decode are line-local, so they
    run inside whatever scan carries the lines — no Python, no shuffle.
  * `socket_tx_stream` — the protocol over Structured Streaming's socket
    source: a drop-in queue consumer for tests and small deployments. At
    cluster scale the same `wire_to_tx` projection sits on a Kafka source
    (`spark.readStream.format("kafka")` → value cast to string → decode);
    only the transport line changes, which is the point of keeping the
    codec a pure column expression.
  * `queue_roundtrip_gate` — driver-gradeable: the tx stream is encoded to
    wire lines, a deterministic subset is REPLAYED (the at-least-once
    hazard), and the consumer projection decodes + exactly-onces the
    result; graded against an oracle that recomputes delivery counts from
    the same replay rule. Duplicate elimination on the decoded frame is
    how the Spark consumer makes at-least-once effectively-once (the
    batch twin of streaming dropDuplicates-within-watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apmbackend_spark.functions.text import hash64, hash64_sql

# TxEntry wire column order (entries.js:19)
_WIRE_COLS = (
    "server", "service", "logid", "acctnum",
    "startts", "endts", "elapsed", "toplevel",
)


def tx_to_wire(tx: DataFrame) -> DataFrame:
    """Producer encode: one wire line per tx record (column ``value``).
    NULL numerics render as the reference's literal ``NaN``."""
    parts = [F.lit("tx")]
    for c in _WIRE_COLS:
        col = F.col(c)
        if c in ("acctnum", "startts"):
            col = F.coalesce(col.cast("string"), F.lit("NaN"))
        parts.append(col.cast("string"))
    return tx.select(F.concat_ws("|", *parts).alias("value"))


def wire_to_tx(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Consumer decode: wire lines -> typed tx frame. Line-local codegen
    (split + casts); ``NaN`` numerics decode to NULL the way the
    reference's toPostgresObject drops them. Non-tx-typed lines are
    dropped (other entry types ride other queues)."""
    f = F.split(F.col(value_col), r"\|")

    def num(i: int):
        v = f.getItem(i)
        return F.when(v == "NaN", F.lit(None).cast("long")).otherwise(
            v.cast("long")
        )

    return (
        lines.where(f.getItem(0) == "tx")
        .select(
            f.getItem(1).alias("server"),
            f.getItem(2).alias("service"),
            f.getItem(3).alias("logid"),
            num(4).alias("acctnum"),
            num(5).alias("startts"),
            num(6).alias("endts"),
            num(7).alias("elapsed"),
            f.getItem(8).alias("toplevel"),
        )
    )


def socket_tx_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Queue consumer over the socket source: wire lines in, typed tx
    stream out (with the `endtime` event-time column the windowed
    operators key on). Swap the two reader lines for format('kafka') +
    `value.cast('string')` to consume the same protocol from a real
    broker."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", int(port))
        .load()
    )
    tx = wire_to_tx(lines)
    return tx.withColumn("endtime", F.timestamp_millis(F.col("endts")))


# deterministic at-least-once replay rule for the graded gate: every tx
# whose 60-bit logid hash ends in 7 is delivered twice
_REPLAY_MOD = 10
_REPLAY_REM = 7


def queue_roundtrip_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded S3/S4 codec + at-least-once gate: tx -> wire encode -> a
    deterministic duplicate replay (hash(logid) % 10 == 7 delivered twice,
    the consumer-ack crash-replay hazard) -> consumer decode ->
    per-record delivery accounting + exactly-once projection. Output is
    one row per UNIQUE tx with its delivery count; the oracle recomputes
    both from the raw stream, so a codec bug (field order, NaN handling,
    type cast) or a broken dedup breaks the value hash."""
    from apmbackend_spark.sources.tx import load_tx

    tx = load_tx(spark, sf_dir).drop("endtime")
    wire = tx_to_wire(tx)
    replay = wire.where(
        F.pmod(hash64(F.split(F.col("value"), r"\|").getItem(3)), F.lit(_REPLAY_MOD))
        == F.lit(_REPLAY_REM)
    )
    delivered = wire.unionByName(replay)
    decoded = wire_to_tx(delivered)
    return decoded.groupBy(*_WIRE_COLS).agg(
        F.count(F.lit(1)).alias("n_deliveries")
    )


def queue_roundtrip_oracle_sql() -> str:
    """Appends to TX_CTE: the decoded frame must equal tx verbatim, with
    delivery counts from the same hash-replay rule."""
    h = hash64_sql("logid")
    return f"""
SELECT server, service, logid, acctnum, startts, endts, elapsed, toplevel,
       CAST(CASE WHEN {h} % {_REPLAY_MOD} = {_REPLAY_REM} THEN 2 ELSE 1 END AS BIGINT)
           AS n_deliveries
FROM tx
"""
