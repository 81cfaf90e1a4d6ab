"""Alert debounce (F4) and cooldown (F5) trace semantics
(reference stream_process_alerts.js:358-467)."""

from __future__ import annotations

from apmbackend_spark.operators.alerts import (
    AlertConfig,
    cooldown_trace_py,
    debounce_trace_py,
)


def test_debounce_requires_sustained_bad_intervals():
    # 2 bad intervals never trigger at required=3; 3 in a row do.
    trace = debounce_trace_py([True, True, False, True, True, True], 6, 3)
    assert [t for _, t in trace] == [False, False, False, False, True, True]
    assert [c for c, _ in trace] == [1, 2, 1, 2, 3, 4]


def test_debounce_counter_clamps():
    ws = 4
    trace = debounce_trace_py([True] * 10, ws, 3)
    # increments only while counter <= window size -> saturates at ws+1
    assert [c for c, _ in trace][-1] == ws + 1
    # quiet intervals decrement but floor at 0
    trace2 = debounce_trace_py([False] * 3 + [True] + [False] * 5, ws, 3)
    counters = [c for c, _ in trace2]
    assert counters[:3] == [0, 0, 0] and counters[3] == 1 and counters[-1] == 0


def test_debounce_asymmetric_hysteresis():
    # long bad run, then alternating: the counter decays slowly (one per
    # quiet interval), so triggering persists through short quiet gaps.
    flags = [True] * 6 + [False, True, False, True]
    trace = debounce_trace_py(flags, 6, 3)
    # after the run the counter sits at 6; F,T,F,T walks 5,6,5,6 — every
    # fired interval still triggers, quiet ones never do.
    assert [t for _, t in trace[6:]] == [False, True, False, True]


def test_cooldown_strict_inequality():
    cooldown_ms = 60_000.0
    ts = [0, 30_000, 60_000, 60_001, 121_000]
    keep = cooldown_trace_py(ts, cooldown_ms)
    # 60_000 - 0 is NOT > 60_000 (strict), 60_001 is; 121_000 - 60_001 =
    # 60_999 clears the cooldown again.
    assert keep == [True, False, False, True, True]


def test_cooldown_measured_from_last_emitted():
    cooldown_ms = 10.0
    ts = [0, 5, 11, 20, 25, 36]
    keep = cooldown_trace_py(ts, cooldown_ms)
    assert keep == [True, False, True, False, True, True]


def test_pipeline_end_to_end_counts(spark):
    # A deterministic mini-series: one key alternates hot/quiet.
    import pandas as pd

    from apmbackend_spark.operators.alerts import alert_pipeline

    rows = []
    for i in range(40):
        hot = i >= 10  # sustained breach from interval 10 on
        rows.append(
            {
                "timestamp": i * 10_000,
                "server": "srv0",
                "service": "svc",
                "lag": 60,
                "tpm": 1.0,
                "average": 50_000.0 if hot else 100.0,
                "averagesignal": 0,
                "per75": 100.0,
                "per75signal": 0,
                "per95": 100.0,
                "per95signal": 0,
            }
        )
    fs = spark.createDataFrame(pd.DataFrame(rows))
    cfg = AlertConfig(
        hard_max_ms=10_000.0,
        window_size=6,
        required_bad=3,
        cooldown_minutes=1.0,
        min_tpm=0.5,
    )
    alerts = alert_pipeline(fs, cfg).collect()
    # breach starts at t=100s; counter hits 3 at t=120s; cooldown 60s
    # passes alerts at 120s, then next at >180s, >240s ... through 390s.
    got = sorted(a["alerttimestamp"] for a in alerts)
    assert got[0] == 120_000
    assert all(b - a > 60_000 for a, b in zip(got, got[1:]))
    assert all(a["cause"] == "average exceeded hard ms threshold" for a in alerts)
