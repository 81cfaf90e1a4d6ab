"""ORC lake roundtrip: values equal the parquet source, and the pruned
read really prunes (partition filter) and pushes (predicate pushdown)."""

from __future__ import annotations


def test_orc_roundtrip_equals_parquet_rollup(spark):
    from apmbackend_spark.sources.loaders import load_table
    from apmbackend_spark.sources.orc import orc_roundtrip
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    got = {r["source"]: r for r in orc_roundtrip(spark, SF_SMOKE).collect()}
    want = {
        r["source"]: r
        for r in load_table(spark, SF_SMOKE, "documents")
        .where((F.col("lang") == "en") & (F.col("n_chars") >= 200))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for src in got:
        assert tuple(got[src]) == tuple(want[src]), src


def test_orc_scan_prunes_partitions_and_pushes_predicates(spark):
    from apmbackend_spark.sources.orc import orc_roundtrip
    from tests.conftest import SF_SMOKE

    df = orc_roundtrip(spark, SF_SMOKE)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Format: orc" in p or "orc" in p.lower()
    # lang is a partition filter (directory pruning), n_chars pushes into
    # the ORC reader
    assert "PartitionFilters" in p and "lang" in p.split("PartitionFilters", 1)[1][:200]
    pushed = p.split("PushedFilters", 1)
    assert len(pushed) == 2 and "n_chars" in pushed[1][:200]
