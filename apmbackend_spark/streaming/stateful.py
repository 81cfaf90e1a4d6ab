"""Streaming ports of the recursive operators (SURVEY.md §7 phase 3/4):
influence-damped z-score (A9) and alert debounce/cooldown (F4/F5) as
`applyInPandasWithState` stateful stages.

State layout per (server, service) group: one array<double> history per
(lag, metric) — exactly the reference's FIFO lists capped at lag
(stream_calc_z_score.js:285-306), restored/persisted through Spark's state
store (the reference's JSON resume files, stream_calc_stats.js:54-87).
Nulls inside histories are preserved (they occupy length, skip stats —
util_methods.js:10-24).

Scale: state is hash-partitioned by key, bounded at lag values per metric
(8640 doubles worst case), checkpointed incrementally — the RocksDB state
store holds millions of keys without driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from apmbackend_spark.operators.zscore import METRICS, zscore_step


def _out_schema(metrics: tuple[str, ...]) -> str:
    parts = [
        "timestamp long",
        "server string",
        "service string",
        "tpm double",
        "lag int",
    ]
    for m in metrics:
        parts += [
            f"{m} double",
            f"{m}avg double",
            f"{m}lb double",
            f"{m}ub double",
            f"{m}signal int",
        ]
    return ", ".join(parts)


def _state_schema(lags: tuple[int, ...], metrics: tuple[str, ...]) -> StructType:
    return StructType(
        [
            StructField(f"h_{lag}_{m}", ArrayType(DoubleType(), True), True)
            for lag in lags
            for m in metrics
        ]
    )


def _zscore_scan_batch(
    server: str,
    service: str,
    rows: pd.DataFrame,
    hists: list[list],
    lags: tuple[int, ...],
    threshold: float,
    influence: float,
    metrics: tuple[str, ...],
) -> pd.DataFrame:
    """One micro-batch of the reference z-score scan for ONE key: rows must
    be timestamp-sorted; `hists` (one FIFO per (lag, metric) slot) is
    mutated in place so the caller can persist it to whichever state store
    backs the operator. Shared by the applyInPandasWithState and
    transformWithStateInPandas renderings — identical semantics by
    construction."""
    # Column-list iteration (no iterrows): identical per-step arithmetic
    # (zscore_step on Python floats), ~10x less per-row overhead — the
    # loop dominates the availableNow drain gates' wall time.
    ts_vals = rows["timestamp"].tolist()
    tpm_vals = rows["tpm"].tolist()
    metric_vals = {
        m: [None if pd.isna(v) else float(v) for v in rows[m].tolist()]
        for m in metrics
    }
    n = len(ts_vals)
    out = []
    for li, lag in enumerate(lags):
        for i in range(n):
            rec = {
                "timestamp": int(ts_vals[i]),
                "server": server,
                "service": service,
                "tpm": float(tpm_vals[i]),
                "lag": lag,
            }
            for mi, m in enumerate(metrics):
                slot = li * len(metrics) + mi
                x = metric_vals[m][i]
                appended, avg, lb, ub, signal = zscore_step(
                    lag, threshold, influence, x, hists[slot]
                )
                rec[m] = x
                rec[f"{m}avg"] = avg
                rec[f"{m}lb"] = lb
                rec[f"{m}ub"] = ub
                rec[f"{m}signal"] = signal
                hists[slot].append(appended)
                if len(hists[slot]) > lag:
                    hists[slot].pop(0)
            out.append(rec)
    cols = ["timestamp", "server", "service", "tpm", "lag"]
    for m in metrics:
        cols += [m, f"{m}avg", f"{m}lb", f"{m}ub", f"{m}signal"]
    return pd.DataFrame(out, columns=cols)


def zscore_stateful(
    st_stream: DataFrame,
    lags: Iterable[int] = (360, 8640),
    threshold: float = 3.0,
    influence: float = 0.1,
    metrics: Iterable[str] = METRICS,
) -> DataFrame:
    """Exact reference z-score semantics as a streaming stateful operator.
    Each micro-batch's rows are processed in timestamp order per key; the
    histories live in the state store across batches."""
    lags = tuple(int(x) for x in lags)
    metrics = tuple(metrics)
    out_schema = _out_schema(metrics)
    state_schema = _state_schema(lags, metrics)
    n_slots = len(lags) * len(metrics)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        server, service = key
        if state.exists:
            stored = state.get
            hists = [list(x) if x is not None else [] for x in stored]
        else:
            hists = [[] for _ in range(n_slots)]

        rows = pd.concat(list(pdfs)).sort_values("timestamp")
        out = _zscore_scan_batch(
            server, service, rows, hists, lags, threshold, influence, metrics
        )
        state.update(tuple(hists))
        yield out

    return st_stream.groupBy("server", "service").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# A2 streaming zero-fill: remembered keys + event-time timers.
# ---------------------------------------------------------------------------

ZF_SLIDE_MS = 10_000


def bucket_zerofill_stateful(
    tx_stream: DataFrame,
    slide_ms: int = ZF_SLIDE_MS,
    watermark: str = "60 seconds",
    time_col: str = "endtime",
) -> DataFrame:
    """A2 zero-row emission as a streaming operator (SURVEY 'hard part #4').
    Emits (timestamp, server, service, cnt, sum_elapsed) per 10 s bucket for
    every key ever seen, cnt=0 while silent — the reference iterates every
    known key each interval (stream_calc_stats.js:159-202). The remembered
    key dimension lives in the state store, and watermark-driven
    ``EventTimeTimeout`` ticks wake silent keys: a timed-out group is invoked
    with no input rows, emits its zero rows, and re-arms the timeout for the
    next bucket boundary. (transformWithState timers would express the same
    thing; applyInPandasWithState timeouts are the portable form — no
    protobuf dependency.)

    State per key: last finalized bucket + pending bucket partials (bounded
    by watermark delay / slide — a bucket finalizes only once the watermark
    passes its end, so late rows inside the delay still count exactly).
    Batch twin: the bucket grid of ``operators.zerofill.st_zerofill``;
    full-window stats compose downstream exactly as window_stats composes
    over buckets.

    Scale: keys partition across the cluster and timeouts fire where the key
    lives — no global key enumeration anywhere; state is a few longs plus
    the in-flight buckets."""
    slide = int(slide_ms)
    out_schema = (
        "timestamp long, server string, service string, cnt long, sum_elapsed long"
    )
    state_schema = StructType(
        [
            StructField("last_bucket", LongType(), True),
            StructField("pend_b", ArrayType(LongType(), True), True),
            StructField("pend_cnt", ArrayType(LongType(), True), True),
            StructField("pend_sum", ArrayType(LongType(), True), True),
        ]
    )
    out_cols = ["timestamp", "server", "service", "cnt", "sum_elapsed"]

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        server, service = key
        if state.exists:
            last_b, pb, pc, ps = state.get
            pending = {int(b): (int(c), int(s)) for b, c, s in zip(pb, pc, ps)}
        else:
            last_b, pending = None, {}

        if not state.hasTimedOut:
            for pdf in pdfs:
                for endts, elapsed in zip(pdf["endts"], pdf["elapsed"]):
                    b = int(endts) // slide
                    c, s = pending.get(b, (0, 0))
                    pending[b] = (c + 1, s + int(elapsed))
            if last_b is None and pending:
                last_b = min(pending) - 1

        wm = state.getCurrentWatermarkMs()
        out = []
        if last_b is not None:
            hi = wm // slide - 1  # highest bucket fully below the watermark
            for b in range(int(last_b) + 1, hi + 1):
                c, s = pending.pop(b, (0, None))
                out.append((b * slide, server, service, c, s))
            last_b = max(int(last_b), hi)

        state.update(
            (
                None if last_b is None else int(last_b),
                list(pending),
                [c for c, _ in pending.values()],
                [s for _, s in pending.values()],
            )
        )
        # next tick strictly above the current watermark so silent keys keep
        # finalizing buckets as the watermark advances
        state.setTimeoutTimestamp((wm // slide + 2) * slide)
        yield pd.DataFrame(out, columns=out_cols)

    return (
        tx_stream.withWatermark(time_col, watermark)
        .groupBy("server", "service")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# F4/F5 streaming: alert debounce + cooldown with store-backed state.
# ---------------------------------------------------------------------------

_DEBOUNCE_OUT = (
    "timestamp long, server string, service string, lag int, tpm double, "
    "average double, per75 double, per95 double, cause string, badcount int"
)
_DEBOUNCE_COLS = [
    "timestamp", "server", "service", "lag", "tpm",
    "average", "per75", "per95", "cause", "badcount",
]


def alert_debounce_stateful(flagged_stream: DataFrame, cfg) -> DataFrame:
    """F4 as a stateful streaming stage: per (server, service, lag) the
    rolling bad-interval counter lives in the state store, so the trace
    continues EXACTLY across micro-batches (same ``debounce_trace_py`` as
    the batch operator, seeded with the stored counter). Input needs the
    full interval series with quiet rows marked cause='' (the counter must
    see them to decay)."""
    from apmbackend_spark.operators.alerts import debounce_trace_py

    ws, req = int(cfg.window_size), int(cfg.required_bad)
    state_schema = StructType([StructField("counter", IntegerType(), True)])

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        c0 = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdfs)).sort_values("timestamp")
        flags = [bool(x) for x in (rows["cause"] != "").tolist()]
        trace = debounce_trace_py(flags, ws, req, start=c0)
        state.update((int(trace[-1][0]) if trace else int(c0),))
        rows = rows.assign(badcount=[c for c, _ in trace])
        yield rows[np.array([t for _, t in trace], dtype=bool)][_DEBOUNCE_COLS]

    return (
        flagged_stream.select(*_DEBOUNCE_COLS[:-1])
        .groupBy("server", "service", "lag")
        .applyInPandasWithState(
            fn,
            outputStructType=_DEBOUNCE_OUT,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def alert_cooldown_stateful(triggered_stream: DataFrame, cfg) -> DataFrame:
    """F5 as a stateful streaming stage: per service, the last-kept alert
    timestamp persists in the state store; within a batch ties break by
    (timestamp, server, lag) exactly like the batch operator."""
    from apmbackend_spark.operators.alerts import cooldown_trace_py

    cooldown_ms = float(cfg.cooldown_minutes) * 60_000.0
    out_schema = (
        "alerttimestamp long, entrytimestamp long, server string, "
        "service string, lag int, cause string"
    )
    state_schema = StructType([StructField("last_ts", LongType(), True)])

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last0 = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs)).sort_values(["timestamp", "server", "lag"])
        ts = rows["timestamp"].tolist()
        keep = cooldown_trace_py(ts, cooldown_ms, last=last0)
        kept_ts = [t for t, k in zip(ts, keep) if k]
        state.update((int(kept_ts[-1]) if kept_ts else (None if last0 is None else int(last0)),))
        kept = rows[np.array(keep, dtype=bool)]
        yield pd.DataFrame(
            {
                "alerttimestamp": kept["timestamp"],
                "entrytimestamp": kept["timestamp"],
                "server": kept["server"],
                "service": kept["service"],
                "lag": kept["lag"],
                "cause": kept["cause"],
            }
        )

    return (
        triggered_stream.select("timestamp", "server", "service", "lag", "cause")
        .groupBy("service")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def alerts_stateful(fs_stream: DataFrame, cfg) -> DataFrame:
    """F1-F6 end to end on a stream. Spark allows one
    ``applyInPandasWithState`` per streaming query, so the two recursive
    stages fuse into a single operator keyed by service — the cooldown's
    natural key (the reference's last-alert registry is per-service,
    stream_process_alerts.js:436-467). Inside a group, each (server, lag)
    sub-series runs its debounce counter from stored state, then the
    cooldown scans the triggered rows in (timestamp, server, lag) order —
    identical ordering to the batch ``alert_pipeline``. State = parallel
    arrays of (server, lag) -> counter plus the last-kept timestamp;
    parallelism is #services, which is exactly the contention the
    reference's per-service registry imposes.

    Batch twin: ``operators.alerts.alert_pipeline``."""
    from apmbackend_spark.operators.alerts import (
        _with_cause,
        cooldown_trace_py,
        debounce_trace_py,
    )
    from pyspark.sql.types import StringType

    ws, req = int(cfg.window_size), int(cfg.required_bad)
    cooldown_ms = float(cfg.cooldown_minutes) * 60_000.0
    out_schema = (
        "alerttimestamp long, entrytimestamp long, server string, "
        "service string, lag int, cause string"
    )
    state_schema = StructType(
        [
            StructField("servers", ArrayType(StringType(), True), True),
            StructField("lags", ArrayType(IntegerType(), True), True),
            StructField("counters", ArrayType(IntegerType(), True), True),
            StructField("last_ts", LongType(), True),
        ]
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            servers, lags_, counters, last_ts = state.get
            ctr = {
                (srv, int(lg)): int(c)
                for srv, lg, c in zip(servers or [], lags_ or [], counters or [])
            }
        else:
            ctr, last_ts = {}, None

        rows = pd.concat(list(pdfs))
        trig_frames = []
        for (srv, lg), sub in rows.groupby(["server", "lag"], sort=False):
            sub = sub.sort_values("timestamp")
            flags = [bool(x) for x in (sub["cause"] != "").tolist()]
            trace = debounce_trace_py(flags, ws, req, start=ctr.get((srv, int(lg)), 0))
            if trace:
                ctr[(srv, int(lg))] = int(trace[-1][0])
            # np bool mask: a plain (possibly empty) list would be taken as
            # a COLUMN selection by pandas
            trig_frames.append(sub[np.array([t for _, t in trace], dtype=bool)])
        trig = (
            pd.concat(trig_frames).sort_values(["timestamp", "server", "lag"])
            if trig_frames
            else rows.iloc[0:0]
        )
        ts = trig["timestamp"].tolist()
        keep = cooldown_trace_py(ts, cooldown_ms, last=last_ts)
        kept_ts = [t for t, k in zip(ts, keep) if k]
        if kept_ts:
            last_ts = int(kept_ts[-1])
        state.update(
            (
                [s for s, _ in ctr],
                [int(l) for _, l in ctr],
                [int(c) for c in ctr.values()],
                None if last_ts is None else int(last_ts),
            )
        )
        kept = trig[np.array(keep, dtype=bool)]
        yield pd.DataFrame(
            {
                "alerttimestamp": kept["timestamp"],
                "entrytimestamp": kept["timestamp"],
                "server": kept["server"],
                "service": kept["service"],
                "lag": kept["lag"],
                "cause": kept["cause"],
            }
        )

    flagged = _with_cause(fs_stream, cfg, keep_quiet=True)
    return (
        flagged.select(*_DEBOUNCE_COLS[:-1])
        .groupBy("service")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# A9 on transformWithState (Spark 4 typed-state API) — the forward path.
# ---------------------------------------------------------------------------


class ZScoreProcessor(StatefulProcessor):
    """A9 z-score as a ``transformWithStateInPandas`` StatefulProcessor —
    semantically identical to ``zscore_stateful`` (both delegate to
    ``_zscore_scan_batch``), rendered on Spark 4's typed-state API.

    Why keep both renderings: applyInPandasWithState is the portable form
    (works on any state store provider and needs no extra Python deps);
    transformWithState is the forward path — typed per-key state handles
    (ValueState here), independent state variables, TTL, and timers, backed
    by the RocksDB state store. At 100 TB the state layout is the same
    per-key O(lags x metrics x lag) histories, hash-partitioned; RocksDB
    keeps multi-million-key state off-heap with incremental (changelog)
    checkpointing.

    Runtime requirement: the TWS Python worker speaks protobuf to the state
    server, so `google.protobuf` must be importable on executors (it is not
    in this CI container — the parity test skips itself there, and
    zscore_stateful stays the default engine path).

    Reference semantics carried over exactly: FIFO histories capped at lag,
    null-preserving, influence damping on signal
    (stream_calc_z_score.js:66-104,285-306).
    """

    def __init__(
        self,
        lags: tuple[int, ...] = (360, 8640),
        threshold: float = 3.0,
        influence: float = 0.1,
        metrics: tuple[str, ...] = METRICS,
    ) -> None:
        self._lags = tuple(int(x) for x in lags)
        self._threshold = float(threshold)
        self._influence = float(influence)
        self._metrics = tuple(metrics)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._hist = handle.getValueState(
            "hist", _state_schema(self._lags, self._metrics)
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        server, service = key
        n_slots = len(self._lags) * len(self._metrics)
        if self._hist.exists():
            stored = self._hist.get()
            hists = [list(x) if x is not None else [] for x in stored]
        else:
            hists = [[] for _ in range(n_slots)]
        pdfs = list(rows)
        batch = pd.concat(pdfs).sort_values("timestamp")
        out = _zscore_scan_batch(
            server,
            service,
            batch,
            hists,
            self._lags,
            self._threshold,
            self._influence,
            self._metrics,
        )
        self._hist.update(tuple(hists))
        yield out

    def close(self) -> None:
        pass


def zscore_tws(
    st_stream: DataFrame,
    lags: Iterable[int] = (360, 8640),
    threshold: float = 3.0,
    influence: float = 0.1,
    metrics: Iterable[str] = METRICS,
) -> DataFrame:
    """``zscore_stateful`` on transformWithStateInPandas. Requires the
    RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider); see tests/test_streaming.py for the
    conf wiring."""
    lags = tuple(int(x) for x in lags)
    metrics = tuple(metrics)
    return st_stream.groupBy("server", "service").transformWithStateInPandas(
        statefulProcessor=ZScoreProcessor(lags, threshold, influence, metrics),
        outputStructType=_out_schema(metrics),
        outputMode="append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Streaming funnel: per-user sequential-pattern state machine.
# ---------------------------------------------------------------------------


def funnel_stateful(
    events_stream: DataFrame, steps: tuple[str, ...]
) -> DataFrame:
    """The streaming form of ``operators/sessions.funnel_steps`` — the
    documented flip for unbounded per-user histories: instead of
    collecting a user's whole event list into one aggregation buffer, the
    funnel's stage pointer and step timestamps live in the STATE STORE
    and each micro-batch advances them over just that batch's rows.

    State per user: (stage, t1..tk, n_seen) — O(k), independent of
    history length; per-task input is one micro-batch. Batch rows are
    folded in (ts_us, event_id) order, the same total order as the batch
    operator, so on time-cut deliveries the two forms agree exactly.

    Each batch emits the user's post-batch funnel row tagged with the
    cumulative ``n_seen``; a key's final row is its max-``n_seen`` one
    (strictly increasing across the batches that contain the key, so the
    argmax is unique and deterministic).
    """
    k = len(steps)
    out_schema = (
        "user_id long, stage int, "
        + ", ".join(f"t{i+1} long" for i in range(k))
        + ", n_seen long"
    )
    state_schema = StructType(
        [StructField("stage", IntegerType())]
        + [StructField(f"t{i+1}", LongType()) for i in range(k)]
        + [StructField("n_seen", LongType())]
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.exists:
            stored = state.get
            stage = int(stored[0])
            times = [
                None if stored[1 + i] is None else int(stored[1 + i])
                for i in range(k)
            ]
            n_seen = int(stored[1 + k])
        else:
            stage, times, n_seen = 0, [None] * k, 0

        rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        n_seen += len(rows)
        if stage < k:
            for ty, tus in zip(rows["event_type"], rows["ts_us"]):
                if ty == steps[stage]:
                    times[stage] = int(tus)
                    stage += 1
                    if stage == k:
                        break
        state.update((stage, *times, n_seen))
        out = {"user_id": pd.Series([uid], dtype="int64")}
        out["stage"] = pd.Series([stage], dtype="int32")
        for i in range(k):
            out[f"t{i+1}"] = pd.Series([times[i]], dtype="Int64")
        out["n_seen"] = pd.Series([n_seen], dtype="int64")
        yield pd.DataFrame(out)

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming nearest-event join (direction-agnostic as-of with tolerance) —
# the stateful port of operators/correlation.py::nearest_event_join.
# ---------------------------------------------------------------------------

NEAREST_OUT_SCHEMA = (
    "logid string, server string, endts long, gauge_ts long, "
    "heapused long, dist_ms long, direction string"
)


def nearest_stateful(
    rows_stream: DataFrame, tol_ms: int = 100_000
) -> DataFrame:
    """Streaming form of the nearest-gauge temporal join: tx rows pick the
    NEAREST gauge on their server within ``tol_ms``, earlier OR later,
    ties backward — EXACTLY the batch operator's semantics
    (``nearest_event_join``; reference anchor: the entry/exit correlator's
    gauge alignment, correlate_logs.js), decided incrementally.

    Input: ONE time-ordered stream per server of
    (server, ts, kind, logid, g_heap) rows — kind 0 = gauge, 1 = tx,
    2 = end-of-stream marker. Deliveries must be time-consecutive (the
    gate cuts on ts), so within a key later batches never rewind time.

    State per server: the latest gauge (backward candidate) plus a PENDING
    buffer of tx rows whose nearest gauge is not yet provable. A pending
    tx resolves the moment its outcome is certain, whichever batch that
    lands in:

      * a GAUGE at g resolves every pending exactly (forward distance
        known; pick backward iff d_b <= d_f, then the tolerance gate);
      * any later row at time c proves a pending with backward distance
        d_b once c - t >= d_b (every future forward candidate is at
        least that far, and ties go backward), and proves a gaugeless /
        distant pending null once c - t > tol (no in-tolerance forward
        can exist; a nearer-but-out-of-tol backward already blocks —
        the batch operator's pick-then-null rule);
      * the end marker (ts = +inf) flushes the rest backward-or-null.

    The pending buffer is bounded by the tolerance window (every pending
    older than tol resolves at the next row), so state is O(tx rate x
    tol) per key regardless of stream length — the 100 TB shape. Same
    oracle as the batch gate; the drain gate forces cross-batch carries
    by cutting deliveries mid-stream.

    A gauge at exactly a tx's ts sorts before it (kind asc), making it
    the backward candidate at distance 0 in both engines — the batch
    comparator's tie rule.
    """
    from pyspark.sql.types import StringType

    tol = int(tol_ms)
    state_schema = StructType(
        [
            StructField("b_ts", LongType(), True),
            StructField("b_heap", LongType(), True),
            StructField("p_logid", ArrayType(StringType(), True), True),
            StructField("p_ts", ArrayType(LongType(), True), True),
        ]
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (server,) = key
        if state.exists:
            b_ts, b_heap, p_logid, p_ts = state.get
            pend = list(zip(list(p_logid or []), list(p_ts or [])))
        else:
            b_ts, b_heap, pend = None, None, []

        out: list[tuple] = []

        def emit(logid, t, g_ts, g_heap, dist, dirn):
            out.append((logid, server, t, g_ts, g_heap, dist, dirn))

        def emit_backward_or_null(logid, t):
            if b_ts is not None and (t - b_ts) <= tol:
                emit(logid, t, b_ts, b_heap, t - b_ts, "b")
            else:
                emit(logid, t, None, None, None, None)

        rows = pd.concat(list(pdfs)).sort_values(["ts", "kind", "logid"])
        for ts, kind, logid, g_heap in zip(
            rows["ts"].tolist(),
            rows["kind"].tolist(),
            rows["logid"].tolist(),
            rows["g_heap"].tolist(),
        ):
            ts, kind = int(ts), int(kind)
            if kind == 0:  # gauge: resolves EVERY pending exactly
                for pl, pt in pend:
                    d_f = ts - pt
                    d_b = None if b_ts is None else pt - b_ts
                    if d_b is not None and d_b <= d_f:
                        emit_backward_or_null(pl, pt)
                    elif d_f <= tol:
                        emit(pl, pt, ts, int(g_heap), d_f, "f")
                    else:
                        emit(pl, pt, None, None, None, None)
                pend = []
                b_ts, b_heap = ts, int(g_heap)
            else:  # tx or end marker: time has advanced to ts
                keep = []
                for pl, pt in pend:
                    df_min = ts - pt
                    d_b = None if b_ts is None else pt - b_ts
                    if d_b is not None and d_b <= df_min:
                        emit_backward_or_null(pl, pt)  # backward wins ties
                    elif df_min > tol:
                        emit(pl, pt, None, None, None, None)
                    else:
                        keep.append((pl, pt))
                pend = keep
                if kind == 1:
                    pend.append((logid, ts))
                else:  # end marker: no future gauges exist
                    for pl, pt in pend:
                        emit_backward_or_null(pl, pt)
                    pend = []

        state.update(
            (
                b_ts,
                b_heap,
                [pl for pl, _ in pend],
                [pt for _, pt in pend],
            )
        )
        yield pd.DataFrame(
            out,
            columns=[
                "logid",
                "server",
                "endts",
                "gauge_ts",
                "heapused",
                "dist_ms",
                "direction",
            ],
        )

    return rows_stream.groupBy("server").applyInPandasWithState(
        fn,
        outputStructType=NEAREST_OUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
