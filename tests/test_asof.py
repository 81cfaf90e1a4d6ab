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
