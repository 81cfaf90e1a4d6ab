"""Unit tests for the SCD2 snapshot merge (operators/scd.py). Cross-engine
parity of the graded composition is in test_oracle_parity.py; these pin the
merge semantics over consecutive deliveries."""

from __future__ import annotations

from apmbackend_spark.operators.scd import scd2_init, scd2_merge


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, bal double")


def _by_version(rows):
    out = {}
    for r in rows:
        out.setdefault(r["k"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["valid_from"])
    return out


def test_two_consecutive_merges_build_history(spark):
    t0, t1, t2 = 0, 100, 200
    scd = scd2_init(_snap(spark, [(1, "A", 1.0), (2, "B", 2.0)]), t0)
    # t1: key 1 changes, key 3 appears, key 2 absent (no news)
    scd = scd2_merge(
        scd, _snap(spark, [(1, "A2", 1.0), (3, "C", 3.0)]), "k",
        ["seg", "bal"], t1,
    )
    # t2: key 1 changes again, key 2 finally changes
    scd = scd2_merge(
        scd, _snap(spark, [(1, "A3", 1.0), (2, "B2", 2.0)]), "k",
        ["seg", "bal"], t2,
    )
    v = _by_version(scd.collect())
    k1 = [(r["seg"], r["valid_from"], r["valid_to"], r["is_current"]) for r in v[1]]
    assert k1 == [("A", 0, 100, False), ("A2", 100, 200, False), ("A3", 200, None, True)]
    k2 = [(r["seg"], r["valid_from"], r["valid_to"], r["is_current"]) for r in v[2]]
    assert k2 == [("B", 0, 200, False), ("B2", 200, None, True)]
    k3 = [(r["seg"], r["valid_from"], r["valid_to"], r["is_current"]) for r in v[3]]
    assert k3 == [("C", 100, None, True)]


def test_unchanged_row_is_not_versioned(spark):
    scd = scd2_init(_snap(spark, [(1, "A", 1.0)]), 0)
    out = scd2_merge(
        scd, _snap(spark, [(1, "A", 1.0)]), "k", ["seg", "bal"], 50
    ).collect()
    assert len(out) == 1
    assert out[0]["valid_from"] == 0 and out[0]["is_current"]


def test_null_transitions_version_correctly(spark):
    # NULL -> value and value -> NULL must both count as changes
    scd = scd2_init(_snap(spark, [(1, None, 1.0), (2, "B", 2.0)]), 0)
    out = scd2_merge(
        scd, _snap(spark, [(1, "A", 1.0), (2, None, 2.0)]), "k",
        ["seg", "bal"], 50,
    )
    v = _by_version(out.collect())
    assert [r["seg"] for r in v[1]] == [None, "A"]
    assert [r["seg"] for r in v[2]] == ["B", None]
    assert all(len(vs) == 2 for vs in v.values())
