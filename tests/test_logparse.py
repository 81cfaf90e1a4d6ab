"""Golden end-to-end test of the log ingest front end: generator ->
parse_logs/logs_to_tx -> compare against the generator's expected records."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from apmbackend_spark.sources.loggen import generate


@pytest.fixture(scope="module")
def logdir():
    d = tempfile.mkdtemp(prefix="apm_logs_")
    g = generate()
    g.write(d)
    yield d, g
    shutil.rmtree(d, ignore_errors=True)


def key(r):
    return (r["server"], r["logid"], r["service"], r["endts"])


def test_logs_to_tx_matches_expected(spark, logdir):
    d, g = logdir
    from apmbackend_spark.sources.logparse import logs_to_tx

    got = {key(r.asDict()): r.asDict() for r in logs_to_tx(spark, f"{d}/logs/*/*.log").collect()}
    exp = {key(e): e for e in g.expected}
    missing = set(exp) - set(got)
    extra = set(got) - set(exp)
    assert not missing, f"missing {len(missing)}: {sorted(missing)[:3]}"
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:3]}"
    for k, e in exp.items():
        r = got[k]
        for f in ("acctnum", "startts", "endts", "elapsed", "toplevel", "matched"):
            assert r[f] == e[f], (k, f, r[f], e[f])


def test_dirty_cases_present(logdir):
    # the generator must actually exercise the dirty paths
    _, g = logdir
    assert any(e["matched"] == "N" for e in g.expected)          # exit w/o entry
    assert any(e["acctnum"] is None for e in g.expected)          # no acct at all
    bafs = [e for e in g.expected if e["acctnum"] and e["acctnum"] >= 100000500]
    assert bafs                                                   # BAF salvage used
    dup_services = [
        e for e in g.expected if e["source"] == "audit" and "Provider:" in e["service"]
    ]
    assert len(dup_services) >= 4                                 # FIFO dup case


def test_parse_is_file_parallel(spark, logdir):
    d, _ = logdir
    from apmbackend_spark.sources.logparse import parse_logs

    df = parse_logs(spark, f"{d}/logs/*/*.log")
    # one group per file; the plan must show the Arrow-grouped map, and the
    # acct/tx union comes out of a single pass
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "FlatMapGroupsInArrow" in plan or "FlatMapGroupsInPandas" in plan
    types = {r["rectype"] for r in df.select("rectype").distinct().collect()}
    assert types == {"tx", "acct"}


def test_parse_iso_ts_handles_naive_and_aware():
    # offset-less ISO strings are UTC by convention; must not raise
    from apmbackend_spark.sources.logparse import parse_iso_ts

    assert parse_iso_ts("2024-01-05T10:00:00") == 1704448800000
    assert parse_iso_ts("2024-01-05T10:00:00+00:00") == 1704448800000
    assert parse_iso_ts("2024-01-05T11:00:00+01:00") == 1704448800000
    assert parse_iso_ts("2024-01-05T10:00:00.123") == 1704448800123
    assert parse_iso_ts("not a timestamp") is None
