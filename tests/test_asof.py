"""gauge_asof tie and miss semantics on hand-built frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from apmbackend_spark.operators.correlation import gauge_asof


def test_asof_picks_latest_at_or_before(spark):
    gauges = spark.createDataFrame(
        [(100, "s1", 10, 1), (200, "s1", 20, 2), (150, "s2", 99, 9)],
        schema="timestamp long, server string, heapused long, threadcnt int",
    )
    tx = spark.createDataFrame(
        [
            ("a", "s1", 99, 5),    # before any gauge -> nulls
            ("b", "s1", 100, 5),   # tie: gauge at exactly endts counts
            ("c", "s1", 150, 5),   # between gauges -> earlier one
            ("d", "s1", 250, 5),   # after last -> latest
            ("e", "s2", 160, 5),   # other server isolated
        ],
        schema="logid string, server string, endts long, elapsed long",
    )
    out = {
        r["logid"]: (r["gauge_ts"], r["heapused"])
        for r in gauge_asof(tx, gauges).collect()
    }
    assert out["a"] == (None, None)
    assert out["b"] == (100, 10)
    assert out["c"] == (100, 10)
    assert out["d"] == (200, 20)
    assert out["e"] == (150, 99)


class TestIntervalJoin:
    def test_boundaries_and_multibucket(self, spark):
        from apmbackend_spark.operators.correlation import interval_join

        # bucket_ms=10: interval [5, 25) covers buckets 0,1,2
        iv = spark.createDataFrame(
            [("k1", 5, 25), ("k2", 5, 25)],
            "server string, session_start long, session_end long",
        )
        pr = spark.createDataFrame(
            [("k1", 4), ("k1", 5), ("k1", 15), ("k1", 24), ("k1", 25),
             ("k2", 15), ("kX", 15)],
            "server string, endts long",
        )
        got = interval_join(
            iv, pr, keys=["server"], ts_col="endts", bucket_ms=10
        ).collect()
        k1 = sorted(r["probe_endts"] for r in got if r["server"] == "k1")
        assert k1 == [5, 15, 24]  # start inclusive, end exclusive; no dups
        assert sorted(r["probe_endts"] for r in got if r["server"] == "k2") == [15]

    def test_empty_interval_dropped(self, spark):
        from apmbackend_spark.operators.correlation import interval_join

        iv = spark.createDataFrame(
            [("k", 10, 10)], "server string, session_start long, session_end long"
        )
        pr = spark.createDataFrame([("k", 10)], "server string, endts long")
        assert interval_join(iv, pr, keys=["server"], bucket_ms=10).count() == 0


class TestGaugeInterpolate:
    def test_bracketed_edge_and_tie_semantics(self, spark):
        from apmbackend_spark.operators.correlation import gauge_interpolate

        gauges = spark.createDataFrame(
            [("s1", 100, 1000, 5), ("s1", 200, 2000, 5)],
            "server string, timestamp long, heapused long, threadcnt int",
        )
        tx = spark.createDataFrame(
            [
                ("a", "s1", 150),  # bracketed: 1000 + 1000*(50/100) = 1500
                ("b", "s1", 100),  # tie: gauge at ts is prev -> interp from 100..200
                ("c", "s1", 250),  # after last gauge: flat 2000
                ("d", "s1", 50),   # before first gauge: flat 1000
                ("e", "s2", 150),  # no gauges on server: NULL
            ],
            "logid string, server string, endts long",
        )
        got = {r["logid"]: r for r in gauge_interpolate(tx, gauges).collect()}
        assert got["a"]["heap_interp"] == 1500.0
        assert got["a"]["prev_ts"] == 100 and got["a"]["next_ts"] == 200
        # at exactly a gauge ts, prev = that gauge, ratio 0 -> its value
        assert got["b"]["heap_interp"] == 1000.0
        assert got["c"]["heap_interp"] == 2000.0 and got["c"]["next_ts"] is None
        assert got["d"]["heap_interp"] == 1000.0 and got["d"]["prev_ts"] is None
        assert got["e"]["heap_interp"] is None


# ---------------------------------------------------------------------------
# nearest_event_join (direction-agnostic, tolerance-bounded)


def test_nearest_event_join_semantics(spark):
    from apmbackend_spark.operators.correlation import nearest_event_join

    gauges = spark.createDataFrame(
        [("s1", 1000, 10), ("s1", 2000, 20), ("s2", 5000, 50)],
        "server string, timestamp long, heapused long",
    )
    tx = spark.createDataFrame(
        [
            ("a", "s1", 1200),  # nearer backward (200 vs 800) -> b
            ("b", "s1", 1900),  # nearer forward (100 vs 900) -> f
            ("c", "s1", 1500),  # exact tie (500/500) -> backward wins
            ("d", "s1", 2000),  # gauge AT ts -> backward, dist 0
            ("e", "s1", 900),   # before first: forward only, dist 100
            ("f", "s1", 2600),  # beyond tol=500 on both sides -> NULL
            ("g", "s2", 5400),  # other server's gauge
            ("h", "s3", 5000),  # no gauges on server -> NULL
        ],
        "logid string, server string, endts long",
    )
    got = {
        r["logid"]: r
        for r in nearest_event_join(tx, gauges, tol_ms=500).collect()
    }
    assert (got["a"]["gauge_ts"], got["a"]["direction"], got["a"]["dist_ms"]) == (1000, "b", 200)
    assert (got["b"]["gauge_ts"], got["b"]["direction"], got["b"]["dist_ms"]) == (2000, "f", 100)
    assert (got["c"]["gauge_ts"], got["c"]["direction"]) == (1000, "b")
    assert (got["d"]["gauge_ts"], got["d"]["direction"], got["d"]["dist_ms"]) == (2000, "b", 0)
    assert (got["e"]["gauge_ts"], got["e"]["direction"], got["e"]["dist_ms"]) == (1000, "f", 100)
    assert got["f"]["gauge_ts"] is None and got["f"]["direction"] is None
    assert (got["g"]["gauge_ts"], got["g"]["heapused"]) == (5000, 50)
    assert got["h"]["gauge_ts"] is None
    assert len(got) == 8  # left semantics: every tx survives


def test_nearest_event_join_single_exchange_no_range_join(spark):
    # on the real fixture (multi-partition, so distributions aren't
    # trivially satisfied): both carry directions share ONE server-keyed
    # window exchange, and there is never an inequality join
    import re

    from apmbackend_spark.operators.correlation import nearest_event_join
    from apmbackend_spark.operators.zerofill import jmx_gauges
    from apmbackend_spark.sources.tx import load_tx
    from tests.conftest import SF_SMOKE

    tx = load_tx(spark, SF_SMOKE)
    df = nearest_event_join(
        tx, jmx_gauges(tx).where(F.col("timestamp") % 180000 == 0)
    )
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    keys = [
        m.group(1) for m in re.finditer(r"hashpartitioning\(([^)]*)\)", p)
    ]
    # ONE window exchange keyed (server, slice) — both carry directions
    # share it; the gauges rollup's (server, minute) exchange differs
    win_keys = [
        k
        for k in keys
        if len(k.split(",")) == 3
        and k.split(",")[0].strip().startswith("server")
        and k.split(",")[1].strip().startswith("slice")
    ]
    assert len(win_keys) == 1
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_nearest_event_join_slicing_is_exact(spark):
    # tiny slices force heavy boundary replication; results must be
    # row-identical to the effectively-global single slice
    from apmbackend_spark.operators.correlation import nearest_event_join
    from apmbackend_spark.operators.zerofill import jmx_gauges
    from apmbackend_spark.sources.tx import load_tx
    from tests.conftest import SF_SMOKE

    tx = load_tx(spark, SF_SMOKE)
    gauges = jmx_gauges(tx).where(F.col("timestamp") % 180000 == 0)

    def rows(slice_ms):
        return sorted(
            (
                r["logid"],
                r["gauge_ts"],
                r["heapused"],
                r["dist_ms"],
                r["direction"],
            )
            for r in nearest_event_join(
                tx, gauges, slice_ms=slice_ms
            ).collect()
        )

    sliced = rows(200_000)           # barely above tol: max replication
    global_ = rows(10**15)           # one slice = the unsliced semantics
    assert sliced == global_


# ---------------------------------------------------------------------------
# gauge_asof_sliced (the documented slice-carry flip, graded form)


def test_gauge_asof_sliced_matches_unsliced_on_fixture(spark):
    # tiny slices (2 min on per-minute gauges) force carries everywhere,
    # including across slices with no gauges; rows must be identical
    from apmbackend_spark.operators.correlation import (
        gauge_asof,
        gauge_asof_sliced,
    )
    from apmbackend_spark.operators.zerofill import jmx_gauges
    from apmbackend_spark.sources.tx import load_tx
    from tests.conftest import SF_SMOKE

    tx = load_tx(spark, SF_SMOKE)
    gauges = jmx_gauges(tx)

    def rows(df):
        return sorted(
            (r["logid"], r["gauge_ts"], r["heapused"], r["threadcnt"])
            for r in df.collect()
        )

    assert rows(gauge_asof_sliced(tx, gauges, slice_ms=120_000)) == rows(
        gauge_asof(tx, gauges)
    )


def test_gauge_asof_sliced_carry_crosses_empty_slices(spark):
    from apmbackend_spark.operators.correlation import gauge_asof_sliced

    gauges = spark.createDataFrame(
        [("s1", 100, 10, 1)],
        "server string, timestamp long, heapused long, threadcnt int",
    )
    tx = spark.createDataFrame(
        # slice_ms=1000: gauge in slice 0; tx in slices 5 and 9 — every
        # intervening slice is empty, the carry must still arrive
        [("a", "s1", 5500, 7), ("b", "s1", 9900, 7), ("c", "s1", 50, 7)],
        "logid string, server string, endts long, elapsed long",
    )
    got = {
        r["logid"]: (r["gauge_ts"], r["heapused"])
        for r in gauge_asof_sliced(tx, gauges, slice_ms=1000).collect()
    }
    assert got["a"] == (100, 10)
    assert got["b"] == (100, 10)
    assert got["c"] == (None, None)  # before any gauge


def test_gauge_asof_sliced_carry_survives_same_slice_later_gauge(spark):
    # Regression: a tx EARLIER than its slice's first gauge must still get
    # the previous slice's latest gauge. The old rows-frame carry dropped
    # the injection whenever the tx's slice contained ANY gauge summary,
    # so tx@5500 (slice 5, before gauge@5800 in the same slice) resolved
    # to NULL instead of gauge@100.
    from apmbackend_spark.operators.correlation import (
        gauge_asof,
        gauge_asof_sliced,
    )

    gauges = spark.createDataFrame(
        [("s1", 100, 10, 1), ("s1", 5800, 20, 2)],
        "server string, timestamp long, heapused long, threadcnt int",
    )
    tx = spark.createDataFrame(
        [("a", "s1", 5500, 7), ("b", "s1", 5900, 7)],
        "logid string, server string, endts long, elapsed long",
    )
    got = {
        r["logid"]: (r["gauge_ts"], r["heapused"])
        for r in gauge_asof_sliced(tx, gauges, slice_ms=1000).collect()
    }
    assert got["a"] == (100, 10)   # carry from slice 0 beats NULL
    assert got["b"] == (5800, 20)  # same-slice gauge beats the carry
    want = {
        r["logid"]: (r["gauge_ts"], r["heapused"])
        for r in gauge_asof(tx, gauges).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# nearest_event_join property test vs a brute-force reference


def _nearest_bruteforce(txs, gauges, tol):
    """O(n*m) literal re-derivation: nearest gauge by distance, ties
    backward, gauge-at-ts counts backward, tolerance inclusive."""
    out = {}
    for logid, server, ts in txs:
        best = None  # (dist, dir_rank, g_ts, heap); dir_rank: b=0, f=1
        for gs, gts, heap in gauges:
            if gs != server:
                continue
            if gts <= ts:
                cand = (ts - gts, 0, gts, heap)
            else:
                cand = (gts - ts, 1, gts, heap)
            if cand[0] > tol:
                continue
            if best is None or (cand[0], cand[1]) < (best[0], best[1]):
                best = cand
        if best is None:
            out[logid] = (None, None, None, None)
        else:
            out[logid] = (best[2], best[3], best[0], "b" if best[1] == 0 else "f")
    return out


def test_nearest_event_join_property_vs_bruteforce(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from apmbackend_spark.operators.correlation import nearest_event_join

    ts_strategy = st.integers(min_value=0, max_value=5000)

    @settings(max_examples=12, deadline=None)
    @given(
        tx_ts=st.lists(ts_strategy, min_size=1, max_size=8),
        g_ts=st.lists(ts_strategy, min_size=0, max_size=6, unique=True),
        tol=st.integers(min_value=1, max_value=1500),
        slice_ms=st.sampled_from([1600, 2000, 10**12]),
    )
    def check(tx_ts, g_ts, tol, slice_ms):
        if tol >= slice_ms:
            return
        txs = [(f"t{i}", "s1", ts) for i, ts in enumerate(tx_ts)]
        gauges = [("s1", ts, ts * 10 + 1) for ts in g_ts]
        tx_df = spark.createDataFrame(
            txs, "logid string, server string, endts long"
        )
        g_df = spark.createDataFrame(
            gauges, "server string, timestamp long, heapused long"
        )
        got = {
            r["logid"]: (
                r["gauge_ts"],
                r["heapused"],
                r["dist_ms"],
                r["direction"],
            )
            for r in nearest_event_join(
                tx_df, g_df, tol_ms=tol, slice_ms=slice_ms
            ).collect()
        }
        want = _nearest_bruteforce(txs, gauges, tol)
        assert got == want

    check()
