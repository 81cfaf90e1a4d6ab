"""Messaging-queue adapter (S3/S4): wire codec round-trip + batch/stream
parity over a real TCP socket with out-of-order, multi-wave, at-least-once
replay. The reference's queue protocol is pipe-delimited TxEntry lines
(entries.js:16-21) with ack-on-receive consumers (queue.js:266-305)."""

from __future__ import annotations

import random
import socket
import threading
import time

import pytest

from pyspark.sql import functions as F

from apmbackend_spark.sources.queue import (
    queue_roundtrip_gate,
    socket_tx_stream,
    tx_to_wire,
    wire_to_tx,
)
from apmbackend_spark.sources.tx import load_tx

SF_DIR = "/root/testdata/sf0.001"
TX_COLS = (
    "server", "service", "logid", "acctnum",
    "startts", "endts", "elapsed", "toplevel",
)


def test_wire_codec_roundtrip(spark):
    tx = load_tx(spark, SF_DIR).drop("endtime")
    back = wire_to_tx(tx_to_wire(tx))
    want = sorted(map(tuple, tx.select(*TX_COLS).collect()))
    got = sorted(map(tuple, back.select(*TX_COLS).collect()))
    assert got == want
    # NULL numerics ride as the reference's literal NaN and decode back
    line = tx_to_wire(
        tx.where(F.col("acctnum").isNull() & F.col("startts").isNull()).limit(1)
    ).collect()[0]["value"]
    assert "|NaN|NaN|" in line


def test_non_tx_lines_dropped(spark):
    lines = spark.createDataFrame(
        [("st|123|srv0|click|1.00|2.0|3.0|4.0",),
         ("tx|srv1|click|42|NaN|NaN|1000|5|N",)],
        "value string",
    )
    rows = wire_to_tx(lines).collect()
    assert len(rows) == 1 and rows[0]["logid"] == "42"
    assert rows[0]["acctnum"] is None and rows[0]["startts"] is None


class _LineServer:
    """One-shot TCP server: accepts a single consumer and sends waves of
    wire lines with pauses between them (so each wave lands in its own
    micro-batch), then holds the connection open until closed."""

    def __init__(self, waves: list[list[str]], wave_gap_s: float = 2.0):
        self.waves = waves
        self.wave_gap_s = wave_gap_s
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self._conn = None
        self._thread = threading.Thread(target=self._serve, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def _serve(self):
        conn, _ = self.sock.accept()
        self._conn = conn
        try:
            for i, wave in enumerate(self.waves):
                if i:
                    time.sleep(self.wave_gap_s)
                conn.sendall(("\n".join(wave) + "\n").encode())
        except OSError:
            pass  # consumer went away first

    def close(self):
        for s in (self._conn, self.sock):
            try:
                if s is not None:
                    s.close()
            except OSError:
                pass


def _disordered_waves(lines: list[str], n_waves: int, block: int, seed: int):
    """Time-ordered input -> waves of blocks with bounded disorder: lines
    are shuffled WITHIN each `block`-line window and adjacent blocks are
    swapped pairwise, so event-time disorder is bounded by ~2 blocks —
    well inside the stream's watermark, while genuinely out-of-order."""
    rng = random.Random(seed)
    blocks = [lines[i : i + block] for i in range(0, len(lines), block)]
    for b in blocks:
        rng.shuffle(b)
    for i in range(0, len(blocks) - 1, 2):
        blocks[i], blocks[i + 1] = blocks[i + 1], blocks[i]
    per_wave = max(-(-len(blocks) // n_waves), 1)  # ceil: every block ships
    return [
        [ln for b in blocks[w : w + per_wave] for ln in b]
        for w in range(0, len(blocks), per_wave)
    ]


def test_socket_stream_parity_out_of_order(spark, tmp_path):
    """Batch/stream parity over the socket transport: a 7-day tx slice is
    served as 3 waves of bounded-disorder wire lines PLUS an at-least-once
    duplicate replay of ~10% of them; the socket consumer's watermarked
    window stats (after exactly-once dedup) must equal the batch operator
    on the same slice."""
    from apmbackend_spark.operators.window_stats import window_stats
    from apmbackend_spark.streaming.pipeline import dedup_stream, window_stats_stream

    # sf0.001 is SPARSE (~1.4 tx/hour): a 7-day slice gives ~230 lines and
    # the 1-day watermark comfortably covers the ~6 h block-level disorder
    watermark = "86400 seconds"
    tx = load_tx(spark, SF_DIR)
    lo = tx.agg(F.min("endts")).collect()[0][0]
    hi = int(lo) + 7 * 24 * 3600 * 1000
    sliced = tx.where(F.col("endts") < hi)
    lines = [
        r["value"]
        for r in tx_to_wire(sliced.orderBy("endts", "logid")).collect()
    ]
    assert len(lines) > 100

    waves = _disordered_waves(lines, n_waves=3, block=8, seed=20260814)
    # at-least-once: replay ~10% of each wave's lines at its tail
    rng = random.Random(1)
    for w in waves:
        w.extend(ln for ln in list(w) if rng.random() < 0.1)
    # flusher wave: one sentinel far enough ahead to close every payload
    # window (window 300 s + watermark + slack), excluded from compare
    flush_ts = hi + 86_400_000 + 600_000
    waves.append([f"tx|srvX|__flush__|flush-1|NaN|NaN|{flush_ts}|1|N"])

    server = _LineServer(waves).start()
    try:
        stream = socket_tx_stream(spark, "127.0.0.1", server.port)
        stream = dedup_stream(stream, watermark=watermark, keys=("logid",))
        st_cols = ("server", "service", "win_start", "cnt", "tpm", "avg_ms", "p75", "p95")
        st = (
            # watermark=None: inherit dedup_stream's watermark (Spark
            # disallows redefining it between stateful operators)
            window_stats_stream(stream, watermark=None)
            .where(F.col("service") != "__flush__")
            .select(*st_cols)
        )
        q = (
            st.writeStream.format("memory")
            .queryName("qsock_st")
            .outputMode("append")
            .start()
        )
        want = sorted(map(tuple, window_stats(sliced).select(*st_cols).collect()))
        deadline = time.time() + 240
        got: list = []
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(f"query died: {q.exception()}")
            got = sorted(
                map(tuple, spark.sql("SELECT * FROM qsock_st").collect())
            )
            if len(got) >= len(want):
                break
            time.sleep(2)
        q.stop()
    finally:
        server.close()
    assert got == want, (len(got), len(want))
    # replay actually happened and was deduped
    assert sum(len(w) for w in waves[:-1]) > len(lines)


def test_queue_roundtrip_gate_counts(spark):
    out = queue_roundtrip_gate(spark, SF_DIR)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_deliveries") == 2).cast("long")).alias("dups"),
    ).collect()[0]
    n_tx = load_tx(spark, SF_DIR).count()
    assert agg["n"] == n_tx + 8      # exactly-once + the 8 NULL-injected rows
    assert 0 < agg["dups"] < n_tx    # the replay rule fired on a subset


# ---------------------------------------------------------------------------
# Round-5: full entry-family codecs (st/fs/al/jx) + NULL field positions.
# ---------------------------------------------------------------------------


def test_tx_wire_null_fields_keep_positions(spark):
    # the round-4 defect class: a NULL in ANY column must not shift later
    # fields (concat_ws alone silently drops NULL columns). Every line has
    # exactly 9 fields and every field round-trips to NULL.
    from apmbackend_spark.sources.queue import _WIRE_COLS, _tx_null_injected

    tx = load_tx(spark, SF_DIR).drop("endtime")
    hostile = _tx_null_injected(tx).subtract(tx)  # just the 8 injected rows
    lines = tx_to_wire(hostile).collect()
    assert len(lines) == 8
    for r in lines:
        assert len(r["value"].split("|")) == 9, r["value"]
    back = sorted(map(tuple, wire_to_tx(tx_to_wire(hostile)).collect()), key=str)
    want = sorted(map(tuple, hostile.select(*_WIRE_COLS).collect()), key=str)
    assert back == want
    # one row per column carries exactly one NULL
    assert sorted(sum(v is None for v in row) for row in back) == [1] * 8


def test_nf_matches_js_tofixed(spark):
    # nf == ES Number.toFixed: sign first, round-half-away-from-zero on
    # the magnitude; missing/NaN -> literal 'undefined'
    from apmbackend_spark.sources.queue import nf

    cases = [
        (123.0, "123.0"), (2.25, "2.3"), (2.75, "2.8"), (-2.25, "-2.3"),
        (0.0, "0.0"), (-0.04, "-0.0"), (0.05, "0.1"), (1.45, "1.5"),
        (None, "undefined"), (float("nan"), "undefined"), (99.96, "100.0"),
    ]
    # 1.45 is stored as 1.45000000000000004..., ABOVE the decimal tie, so
    # exact-value rounding gives "1.5" (JS (1.45).toFixed(1) == "1.5" for
    # the same reason; the .25/.75 binary-exact quarters are the real ties)
    df = spark.createDataFrame([(v,) for v, _ in cases], "x double")
    got = [r["s"] for r in df.select(nf(F.col("x"), 1).alias("s")).collect()]
    assert got == [want for _, want in cases]
    # and the DuckDB twin renders identical strings
    import duckdb

    from apmbackend_spark.sources.queue import nf_sql

    vals = ", ".join(
        "(NULL)" if v is None else f"(CAST('nan' AS DOUBLE))" if v != v else f"({v!r})"
        for v, _ in cases
    )
    rows = duckdb.sql(
        f"SELECT {nf_sql('x', 1)} FROM (VALUES {vals}) AS t(x)"
    ).fetchall()
    assert [r[0] for r in rows] == [want for _, want in cases]


def test_st_wire_roundtrip(spark):
    from apmbackend_spark.sources.queue import st_to_wire, wire_to_st

    st = spark.createDataFrame(
        [
            (1000, "srv0", "click", 12.0, 345.0, 400.0, 500.0),
            (2000, "srv1", None, None, 2.25, None, 0.0),
            (3000, None, "S:purchase", 0.5, -1.5, 1.45, 99.96),
        ],
        "timestamp long, server string, service string, tpm double, "
        "average double, per75 double, per95 double",
    )
    lines = [r["value"] for r in st_to_wire(st).collect()]
    assert all(len(l.split("|")) == 8 for l in lines)
    assert "st|1000|srv0|click|12.00|345.0|400.0|500.0" in lines
    assert "st|2000|srv1|undefined|undefined|2.3|undefined|0.0" in lines
    back = sorted(map(tuple, wire_to_st(st_to_wire(st)).collect()))
    # quantization: integer-valued stats survive; fractional land on grid
    assert back[0] == (1000, "srv0", "click", 12.0, 345.0, 400.0, 500.0)
    assert back[1] == (2000, "srv1", None, None, 2.3, None, 0.0)
    assert back[2] == (3000, None, "S:purchase", 0.5, -1.5, 1.5, 100.0)


def test_fs_wire_roundtrip_subtuples(spark):
    from apmbackend_spark.sources.queue import fs_to_wire, wire_to_fs

    cols = "timestamp long, server string, service string, tpm double, lag int"
    for m in ("average", "per75", "per95"):
        cols += f", {m} double, {m}avg double, {m}lb double, {m}ub double, {m}signal int"
    fs = spark.createDataFrame(
        [
            (
                1000, "srv0", "click", 12.0, 60,
                100.0, 90.5, 80.0, 101.0, 1,
                110.0, None, None, None, 0,
                120.0, 115.25, 100.0, 130.5, -1,
            )
        ],
        cols,
    )
    line = fs_to_wire(fs).collect()[0]["value"]
    # header | avg-subtuple | per75-subtuple | per95-subtuple
    assert line == (
        "fs|1000|srv0|click|60|12.00"
        "|100.0:90.5:80.0:101.0:1"          # averageSignal rendered RAW
        "|110.0:undefined:undefined:undefined:0.0"  # per75Signal through nf
        "|120.0:115.3:100.0:130.5:-1.0"
    )
    back = wire_to_fs(fs_to_wire(fs)).collect()[0]
    assert (back["lag"], back["tpm"]) == (60, 12.0)
    assert (back["averagesignal"], back["per75signal"], back["per95signal"]) == (1, 0, -1)
    assert back["per75avg"] is None and back["per95avg"] == 115.3


def test_al_wire_escape_and_nested_decode(spark):
    from apmbackend_spark.sources.queue import (
        al_to_wire,
        wire_al_roundtrip_gate,
        wire_to_al,
    )

    al = spark.createDataFrame(
        [(5000, 4000, "srv0", "click", "tpm,elapsed", "tx|srv0|click|42|NaN|1|2|3|N")],
        "alerttimestamp long, entrytimestamp long, server string, "
        "service string, cause string, entry string",
    )
    line = al_to_wire(al).collect()[0]["value"]
    # outer fields pipe-delimited; embedded entry pipes escaped to &
    assert line == "al|5000|4000|srv0|click|tpm,elapsed|tx&srv0&click&42&NaN&1&2&3&N"
    dec = wire_to_al(al_to_wire(al)).collect()[0]
    assert dec["entry"] == "tx&srv0&click&42&NaN&1&2&3&N"  # stays escaped
    nested = wire_to_tx(
        wire_to_al(al_to_wire(al)), value_col="entry", delim="&"
    ).collect()[0]
    assert (nested["logid"], nested["acctnum"], nested["elapsed"]) == ("42", None, 3)
    # the graded gate round-trips the fixture identically
    out = wire_al_roundtrip_gate(spark, SF_DIR)
    tx = load_tx(spark, SF_DIR)
    assert out.count() == tx.count()
    mism = out.where(
        (F.col("e_server") != F.col("server"))
        | (F.col("e_service") != F.col("service"))
        | (F.col("alerttimestamp") != F.col("e_endts") + 60000)
    )
    assert mism.count() == 0


def test_jx_wire_roundtrip(spark):
    from apmbackend_spark.sources.jmx import jmx_poll_synthetic
    from apmbackend_spark.sources.queue import jx_to_wire, wire_to_jx

    jmx = jmx_poll_synthetic(spark)
    lines = jx_to_wire(jmx).collect()
    assert all(len(r["value"].split("|")) == 19 for r in lines)
    back = sorted(map(tuple, wire_to_jx(jx_to_wire(jmx)).collect()))
    want = sorted(map(tuple, jmx.collect()))
    assert back == want


def test_wire_decode_composes_over_kafka_frame(spark):
    # the documented "two-line swap to format('kafka')": a broker row is
    # (key binary, value binary, topic, partition, offset, ...); the codec
    # must compose over value.cast('string') without schema assumptions.
    # No broker exists in the sandbox, so the frame is mocked with the
    # exact kafka source column shape.
    kafka_like = spark.createDataFrame(
        [
            (None, b"tx|srv1|click|42|NaN|900|1000|100|N", "apm.tx", 0, 7, 1000),
            (b"k2", b"st|1000|srv0|click|1.40|345.0|400.0|500.0", "apm.tx", 0, 8, 1001),
            (None, b"tx|srv2|S:purchase|43|100000007|NaN|2000|50|Y", "apm.tx", 1, 3, 1002),
        ],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp long",
    )
    lines = kafka_like.select(F.col("value").cast("string").alias("value"))
    rows = {r["logid"]: r for r in wire_to_tx(lines).collect()}
    # non-tx lines on the topic are dropped; fields land typed
    assert set(rows) == {"42", "43"}
    assert rows["42"]["acctnum"] is None and rows["42"]["startts"] == 900
    assert rows["43"]["startts"] is None and rows["43"]["toplevel"] == "Y"
