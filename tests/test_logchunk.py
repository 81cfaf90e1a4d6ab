"""Chunked (multi-task-per-file) log parse must be byte-for-byte equivalent
to the sequential wholetext parse for APP/SERVER grammars — including
CT/EJB start/stop pairs and audit sessions that straddle chunk
boundaries."""

from __future__ import annotations

import glob as globmod
import shutil
import tempfile

import pytest

from apmbackend_spark.sources.loggen import generate
from apmbackend_spark.sources.logparse import classify_file, parse_file


@pytest.fixture(scope="module")
def logdir():
    d = tempfile.mkdtemp(prefix="apm_chunklogs_")
    g = generate()
    g.write(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rowkey(r: dict):
    return tuple(
        r.get(c)
        for c in (
            "rectype", "server", "service", "logid", "altacct",
            "startts", "endts", "elapsed", "toplevel", "matched",
        )
    )


def test_chunked_parse_identical_to_sequential(spark, logdir):
    from apmbackend_spark.sources.logchunk import parse_logs_chunked

    paths = sorted(
        p
        for p in globmod.glob(f"{logdir}/logs/*/*.log")
        if classify_file(p) != "SOAP"
    )
    assert paths

    # ground truth: the sequential wholetext parse, file by file
    expected: list[tuple] = []
    for p in paths:
        with open(p, encoding="utf-8") as f:
            lines = f.read().splitlines()
        expected.extend(_rowkey(r) for r in parse_file(p, lines))

    # tiny chunks force many tasks and many boundary-straddling pairs
    chunk_bytes = 1 << 10
    df = parse_logs_chunked(spark, paths, chunk_bytes=chunk_bytes)
    got = [_rowkey(r.asDict()) for r in df.collect()]

    n_chunks = sum(
        max(1, -(-__import__("os").path.getsize(p) // chunk_bytes))
        for p in paths
    )
    assert n_chunks > len(paths)  # genuinely multi-task per file

    assert sorted(got) == sorted(expected)
    # the dirty paths must actually be exercised across boundaries
    assert any(k[9] == "N" for k in got)  # some stops stay unmatched
    assert any(k[9] == "Y" for k in got)


def test_chunked_parse_rejects_soap(spark, logdir):
    from apmbackend_spark.sources.logchunk import parse_logs_chunked

    soap = [
        p
        for p in globmod.glob(f"{logdir}/logs/*/*.log")
        if classify_file(p) == "SOAP"
    ]
    with pytest.raises(ValueError, match="SOAP"):
        parse_logs_chunked(spark, soap)
