"""Plan + semantics tests for the date-partitioned layout, the salted hot-key
join, and the deterministic corpus split."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_daily_slice_is_partition_pruned(spark):
    from apmbackend_spark.sources import partitioned as pt

    df = pt.daily_slice_rollup(spark, SF_SMOKE)
    p = _plan(df)
    pf = [l for l in p.splitlines() if "PartitionFilters" in l]
    # the day predicate is metadata pruning on log_date, not a data filter
    assert pf and any("log_date" in l for l in pf), p
    # and it is NOT also a rowgroup PushedFilter (the column does not exist
    # in the data files)
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert all("log_date" not in l for l in pushed)


def test_daily_slice_day_boundaries(spark):
    # the pruned slice equals an endts-range filter over the raw tx
    from apmbackend_spark.sources import partitioned as pt
    from apmbackend_spark.sources.tx import load_tx

    day = pt.DEFAULT_DAY
    got = {
        (r["server"], r["service"]): (r["n_tx"], r["total_ms"])
        for r in pt.daily_slice_rollup(spark, SF_SMOKE, day).collect()
    }
    tx = load_tx(spark, SF_SMOKE)
    from apmbackend_spark.functions.scalars import yyyymmdd_int

    want = {
        (r["server"], r["service"]): (r["n_tx"], r["total_ms"])
        for r in tx.where(yyyymmdd_int(F.col("endts")) == day)
        .groupBy("server", "service")
        .agg(F.count(F.lit(1)).alias("n_tx"), F.sum("elapsed").alias("total_ms"))
        .collect()
    }
    assert got == want and got


def test_salted_join_spreads_hot_key(spark):
    from apmbackend_spark.operators import skew as sk
    from apmbackend_spark.sources.tx import load_tx

    tx = load_tx(spark, SF_SMOKE).select("logid", "server", "service", "elapsed")
    profile = tx.groupBy("server", "service").agg(
        F.count(F.lit(1)).alias("key_n")
    )
    joined = sk.salted_join(
        tx, profile, ["server", "service"], F.col("logid"), n_salts=4
    )
    # semantics: identical to the plain join
    assert joined.count() == tx.count()
    # physical: with broadcast off, the shuffle keys on (key..., salt) — the
    # hot key occupies n_salts distinct join partitions
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = _plan(
            sk.salted_join(
                tx, profile, ["server", "service"], F.col("logid"), n_salts=4
            )
        )
        assert "__salt" in p
        assert re.search(r"hashpartitioning\(server[^)]*__salt", p), p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_corpus_split_deterministic_and_single_scan(spark):
    from apmbackend_spark.operators.textstats import corpus_split
    from apmbackend_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    a = {r["doc_id"]: r["split"] for r in corpus_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in corpus_split(docs.repartition(7)).collect()
    }
    # membership survives arbitrary repartitioning (rand()-based wouldn't)
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}
    # ~96/2/2 mixture within loose bounds on 500 docs
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.9 < train / n < 1.0
    p = _plan(corpus_split(docs))
    assert not re.search(r"\(\d+\) Exchange", p)  # no shuffle at all


def test_salted_join_rejects_right_and_full_outer(spark):
    # unmatched dim rows would be emitted n_salts times under right/full
    import pytest
    from pyspark.sql import functions as F

    from apmbackend_spark.operators import skew as sk

    facts = spark.range(4).select(F.col("id").alias("k"), F.lit(1).alias("x"))
    dim = spark.range(6).select(F.col("id").alias("k"), F.lit(2).alias("y"))
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join"):
            sk.salted_join(facts, dim, ["k"], F.col("x"), 4, how=how)
    # left outer stays allowed (facts side is never replicated)
    out = sk.salted_join(facts, dim, ["k"], F.col("x"), 4, how="left")
    assert out.count() == 4


def test_dpp_week_rollup_runtime_prunes(spark):
    # the week filter must reach the partitioned fact scan as a RUNTIME
    # dynamic-pruning subquery on log_date, not a static predicate
    from apmbackend_spark.sources.partitioned import dpp_week_rollup
    from tests.conftest import SF_SMOKE

    p = _plan(dpp_week_rollup(spark, SF_SMOKE))
    assert "dynamicpruning" in p.lower()


def test_files_per_day_bounds_partition_file_count(spark):
    # the advertised file-count knob: files_per_day=3 must produce at most
    # 3 files per day directory, with rollup output identical to the
    # single-file layout
    import glob
    import os

    from pyspark.sql import functions as F

    from apmbackend_spark.sources.partitioned import write_partitioned_by_day
    from apmbackend_spark.sources.tx import load_tx
    from tests.conftest import SF_SMOKE

    tx = load_tx(spark, SF_SMOKE).select("server", "service", "endts", "elapsed")
    path = write_partitioned_by_day(tx, "tx_fpd_test", files_per_day=3)
    for day_dir in glob.glob(os.path.join(path, "log_date=*")):
        files = [f for f in os.listdir(day_dir) if f.endswith(".parquet")]
        assert 1 <= len(files) <= 3, (day_dir, files)
    got = (
        spark.read.parquet(path)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("elapsed").alias("s"))
        .collect()[0]
    )
    want = tx.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("elapsed").alias("s")
    ).collect()[0]
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_merge_upsert_rewrites_only_affected_partitions(spark):
    # partition-level copy-on-write: after the merge, the two target day
    # dirs changed and every OTHER day directory is byte-identical
    import glob
    import os

    from apmbackend_spark.sources.partitioned import (
        DEFAULT_ROOT,
        MERGE_INSERT_DAY,
        MERGE_UPDATE_DAY,
        _token,
        merge_upsert_day,
    )
    from tests.conftest import SF_SMOKE

    def snapshot(path):
        out = {}
        for day_dir in glob.glob(os.path.join(path, "log_date=*")):
            day = day_dir.rsplit("=", 1)[-1]
            files = sorted(
                (f, os.path.getsize(os.path.join(day_dir, f)))
                for f in os.listdir(day_dir)
                if f.endswith(".parquet")
            )
            out[day] = files
        return out

    from apmbackend_spark.sources.partitioned import write_partitioned_by_day
    from apmbackend_spark.sources.tx import load_tx

    # build the base layout OURSELVES so we can snapshot BEFORE the merge
    path = write_partitioned_by_day(
        load_tx(spark, SF_SMOKE).select("server", "service", "endts", "elapsed"),
        "tx_merge_cow_test",
    )
    before = snapshot(path)
    result = merge_upsert_day(spark, SF_SMOKE, path=path)  # merges in place
    after = snapshot(path)
    assert str(MERGE_INSERT_DAY) in after  # new partition exists
    # THE CoW claim: every untouched day directory is byte-identical
    # (same file names — which embed the write job's task IDs — and sizes)
    touched = {str(MERGE_UPDATE_DAY), str(MERGE_INSERT_DAY)}
    for day, files in before.items():
        if day not in touched:
            assert after[day] == files, f"day {day} was rewritten"
    assert after[str(MERGE_UPDATE_DAY)] != before[str(MERGE_UPDATE_DAY)]

    # gate form (rebuilds its own base then re-merges): same post-merge
    # content — idempotent
    rows1 = {tuple(r) for r in result.collect()}
    rows2 = {tuple(r) for r in merge_upsert_day(spark, SF_SMOKE).collect()}
    assert rows1 == rows2
    path = os.path.join(DEFAULT_ROOT, f"tx_merge_{_token(SF_SMOKE)}")
    # deleted service absent from the updated day, present elsewhere
    got = spark.read.parquet(path)
    from pyspark.sql import functions as F

    assert (
        got.where(
            (F.col("log_date") == MERGE_UPDATE_DAY)
            & (F.col("service") == "click")
        ).count()
        == 0
    )
    assert got.where(F.col("service") == "click").count() > 0


def test_retention_drop_is_metadata_only(spark):
    from pyspark.sql import functions as F

    from apmbackend_spark.sources.partitioned import (
        drop_partitions_before,
        write_partitioned_by_day,
    )
    from apmbackend_spark.sources.tx import load_tx
    from tests.conftest import SF_SMOKE

    tx = load_tx(spark, SF_SMOKE).select("server", "service", "endts", "elapsed")
    path = write_partitioned_by_day(tx, "tx_retention_test")
    cutoff = 20240110
    dropped = drop_partitions_before(path, cutoff)
    assert dropped and all(d < cutoff for d in dropped)
    back = spark.read.parquet(path)
    assert back.agg(F.min("log_date")).first()[0] >= cutoff
    # surviving rows identical to a cutoff filter over the raw frame
    from apmbackend_spark.functions.scalars import yyyymmdd_int

    want = tx.where(yyyymmdd_int(F.col("endts")) >= cutoff).count()
    assert back.count() == want
