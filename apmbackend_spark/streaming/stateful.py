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

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
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
        out = []
        for _, r in rows.iterrows():
            for li, lag in enumerate(lags):
                rec = {
                    "timestamp": int(r["timestamp"]),
                    "server": server,
                    "service": service,
                    "tpm": float(r["tpm"]),
                    "lag": lag,
                }
                for mi, m in enumerate(metrics):
                    slot = li * len(metrics) + mi
                    x = r[m]
                    x = None if pd.isna(x) else float(x)
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
        state.update(tuple(hists))
        cols = ["timestamp", "server", "service", "tpm", "lag"]
        for m in metrics:
            cols += [m, f"{m}avg", f"{m}lb", f"{m}ub", f"{m}signal"]
        yield pd.DataFrame(out, columns=cols)

    return st_stream.groupBy("server", "service").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
