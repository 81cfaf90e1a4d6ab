"""Bucketed layout => co-located (shuffle-free) key joins."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from apmbackend_spark.sources import bucketing as bk
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_exchange(spark):
    # At fixture scale Catalyst rightly broadcasts the tiny profile side
    # (and disables bucketed reads — broadcast needs no co-location). The
    # bucketing payoff is the big-big case, so simulate it: with broadcast
    # off, the bucket layout must carry the join with ZERO exchanges.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bk.bucketed_enrich(spark, SF_SMOKE)
        p = _plan(df)
        assert not re.search(r"\(\d+\) Exchange", p), p
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        assert "Bucketed: true" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_enrich_matches_plain_join(spark):
    from apmbackend_spark.sources.tx import load_tx

    bucketed = bk.bucketed_enrich(spark, SF_SMOKE)
    tx = load_tx(spark, SF_SMOKE).select("logid", "server", "service", "elapsed")
    profile = tx.groupBy("server", "service").agg(
        (F.sum("elapsed").cast("double") / F.count(F.lit(1))).alias("key_avg_ms")
    )
    plain = tx.join(profile, ["server", "service"]).select(
        "logid", "server", "service", "elapsed", "key_avg_ms",
        (F.col("elapsed").cast("double") > F.col("key_avg_ms")).alias("above_avg"),
    )
    a = sorted(map(tuple, bucketed.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_write_bucketed_is_rewritable(spark):
    # overwrite must not fail on the second write of the same table name
    from apmbackend_spark.sources.tx import load_tx

    tx = load_tx(spark, SF_SMOKE).select("logid", "server", "service", "elapsed")
    name = bk.write_bucketed(tx, "tx_rewrite_check", ("server", "service"), 4)
    n1 = spark.table(name).count()
    name = bk.write_bucketed(tx, "tx_rewrite_check", ("server", "service"), 4)
    assert spark.table(name).count() == n1
