"""corpus_shuffle permutation contract: bijective addressing, determinism,
seed-independence."""

from __future__ import annotations

from apmbackend_spark.operators.packing import corpus_shuffle
from apmbackend_spark.sources.loaders import load_table
from tests.conftest import SF_SMOKE


def _rows(spark, seed):
    docs = load_table(spark, SF_SMOKE, "documents")
    return {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in corpus_shuffle(docs, n_shards=8, seed=seed).collect()
    }


def test_shuffle_is_bijective_addressing(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    n = docs.count()
    addr = _rows(spark, 42)
    # every document addressed exactly once
    assert len(addr) == n
    # (shard, pos) unique, pos contiguous 1..count within each shard
    by_shard: dict[int, list[int]] = {}
    for shard, pos in addr.values():
        by_shard.setdefault(shard, []).append(pos)
    assert sum(len(v) for v in by_shard.values()) == n
    for shard, poss in by_shard.items():
        assert 0 <= shard < 8
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_shuffle_deterministic_and_seed_sensitive(spark):
    a = _rows(spark, 42)
    b = _rows(spark, 42)
    c = _rows(spark, 7)
    assert a == b  # same seed -> identical epoch order
    assert a != c  # new seed -> a different permutation


def test_spread_widens_narrow_scans_only(spark, tmpdir):
    import pandas as pd

    from apmbackend_spark.sources.loaders import spread

    pdf = pd.DataFrame({"x": range(1000)})
    one = f"{tmpdir}/one_file"
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(one)
    narrow = spark.read.parquet(one)
    widened = spread(narrow)
    target = spark.sparkContext.defaultParallelism
    assert widened.rdd.getNumPartitions() == target
    assert sorted(r["x"] for r in widened.collect()) == list(range(1000))

    many = f"{tmpdir}/many_files"
    spark.createDataFrame(pdf).repartition(target * 2).write.mode(
        "overwrite"
    ).parquet(many)
    wide = spark.read.parquet(many)
    # already-parallel input: no-op, no shuffle added
    assert spread(wide) is wide

    # non-file-backed frames pass through untouched
    mem = spark.createDataFrame(pdf)
    assert spread(mem) is mem
