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


def test_stale_carry_killed_by_consumed_start(spark, tmp_path):
    # Regression (adversarial split): chunk 1 leaves an unconsumed start A;
    # chunk 2 has start B consumed by stop S1 (neither spilled), then stop
    # S2. Sequential: B overwrote A, S1 consumed B -> S2 is UNMATCHED. The
    # repair must NOT resurrect A for S2.
    from apmbackend_spark.sources.logchunk import parse_logs_chunked
    from apmbackend_spark.sources.logparse import parse_logs

    lines = [
        "[L1] 2024-01-05 10:00:00,000 t1 INFO CommonTiming::Start Svc request begins",
        "[L1] 2024-01-05 10:00:02,000 t1 INFO CommonTiming::Start Svc request begins",
        "[L1] 2024-01-05 10:00:02,995 t1 INFO CommonTiming::Stop Svc total time 995",
        "[L1] 2024-01-05 10:00:03,000 t1 INFO CommonTiming::Stop Svc total time 5",
    ]
    d = tmp_path / "logs" / "srva"
    d.mkdir(parents=True)
    f = d / "server.log"
    f.write_text("\n".join(lines) + "\n")

    def rows(df):
        return sorted(
            (r["service"], r["startts"], r["endts"], r["matched"])
            for r in df.where(df.rectype == "tx").collect()
        )

    want = rows(parse_logs(spark, str(f)))
    # force a boundary after every line: chunk size ~ one line length
    got = rows(parse_logs_chunked(spark, [str(f)], chunk_bytes=90))
    assert got == want, (got, want)
    # the second stop must be unmatched in both
    assert ("Svc", 1704448803000 - 5, 1704448803000, "N") in want


def test_stale_carry_killed_across_intermediate_chunk(spark, tmp_path):
    # chunk 1: start A; chunk 2: start B + stop S1 (fully consumed, no
    # spill at all); chunk 3: stop S2 — the intermediate chunk's kill
    # marker must clear A so S2 stays unmatched.
    from apmbackend_spark.sources.logchunk import parse_logs_chunked
    from apmbackend_spark.sources.logparse import parse_logs

    pad = "x" * 60  # widen lines so each chunk holds ~2 lines
    lines = [
        f"[L9] 2024-01-05 11:00:00,000 t1 INFO CommonTiming::Start Svc request begins {pad}",
        f"[L9] 2024-01-05 11:00:02,000 t1 INFO CommonTiming::Start Svc request begins {pad}",
        f"[L9] 2024-01-05 11:00:02,995 t1 INFO CommonTiming::Stop Svc total time 995 {pad}",
        f"[L9] 2024-01-05 11:00:03,000 t1 INFO CommonTiming::Stop Svc total time 5 {pad}",
    ]
    d = tmp_path / "logs" / "srvb"
    d.mkdir(parents=True)
    f = d / "server.log"
    f.write_text("\n".join(lines) + "\n")

    def rows(df):
        return sorted(
            (r["service"], r["startts"], r["endts"], r["matched"])
            for r in df.where(df.rectype == "tx").collect()
        )

    want = rows(parse_logs(spark, str(f)))
    for cb in (80, 150, 300):  # several split geometries
        got = rows(parse_logs_chunked(spark, [str(f)], chunk_bytes=cb))
        assert got == want, (cb, got, want)


def test_null_logid_pair_repaired_across_chunks(spark, tmp_path):
    # Regression (round-4 ADVICE): lines with NO [logid] prefix parse to
    # logid NULL; the repair's pruning semi-join must be null-safe on logid
    # or the kill/stop spill records are dropped while the pend passes,
    # leaving a cross-chunk start/stop pair unrepaired (matched='N' with
    # P7-fallback startts instead of the sequential parse's matched='Y').
    from apmbackend_spark.sources.logchunk import parse_logs_chunked
    from apmbackend_spark.sources.logparse import parse_logs

    lines = [
        # no-logid pair split across chunks (start in chunk 1, stop later)
        "2024-01-05 10:00:00,000 t1 INFO CommonTiming::Start Svc request begins",
        # a logid'd key interleaves so the semi-join has mixed keys
        "[L1] 2024-01-05 10:00:01,000 t1 INFO CommonTiming::Start Svc request begins",
        "[L1] 2024-01-05 10:00:01,500 t1 INFO CommonTiming::Stop Svc total time 500",
        "2024-01-05 10:00:02,000 t1 INFO CommonTiming::Stop Svc total time 2000",
        # second no-logid round: start, then a kill-relevant re-start
        "2024-01-05 10:00:03,000 t1 INFO CommonTiming::Start Svc request begins",
        "2024-01-05 10:00:04,000 t1 INFO CommonTiming::Start Svc request begins",
        "2024-01-05 10:00:04,500 t1 INFO CommonTiming::Stop Svc total time 500",
    ]
    d = tmp_path / "logs" / "srvn"
    d.mkdir(parents=True)
    f = d / "server.log"
    f.write_text("\n".join(lines) + "\n")

    def rows(df):
        return sorted(
            (
                r["logid"] or "", r["service"], r["startts"], r["endts"],
                r["elapsed"], r["matched"],
            )
            for r in df.where(df.rectype == "tx").collect()
        )

    want = rows(parse_logs(spark, str(f)))
    # sequential truth: the split no-logid pair IS matched
    assert ("", "Svc", 1704448800000, 1704448802000, 2000, "Y") in want
    for cb in (60, 90, 150, 300):
        got = rows(parse_logs_chunked(spark, [str(f)], chunk_bytes=cb))
        assert got == want, (cb, got, want)


def test_repair_matches_sequential_on_fuzzed_sequences(spark, tmp_path):
    """Seeded fuzz of the pairing recurrence: random start/stop event
    sequences for a handful of (logid, service) keys interleaved in one
    file, parsed sequentially and chunked at several adversarial chunk
    sizes — outputs must be identical row-for-row. Covers every repair
    interaction: carried pends, head stops, intra-chunk consumed starts
    (kill markers), pend overwrites, and unmatched tails."""
    import random

    from apmbackend_spark.sources.logchunk import parse_logs_chunked
    from apmbackend_spark.sources.logparse import parse_logs

    rng = random.Random(20260814)
    # include a NO-logid key (logid parses to NULL) so the fuzz also covers
    # the null-safe pruning path of the repair semi-join
    keys = [("L%d" % k, "Svc%d" % (k % 3)) for k in range(5)] + [(None, "Svc0")]
    t0 = 1704448800000
    lines = []
    for i in range(120):
        logid, svc = keys[rng.randrange(len(keys))]
        ts = t0 + i * 1000 + rng.randrange(999)
        h, rem = divmod(ts // 1000 % 86400, 3600)
        mnt, sec = divmod(rem, 60)
        tss = f"2024-01-05 {h:02d}:{mnt:02d}:{sec:02d},{ts % 1000:03d}"
        prefix = f"[{logid}] " if logid is not None else ""
        if rng.random() < 0.55:
            lines.append(
                f"{prefix}{tss} t1 INFO CommonTiming::Start {svc} request begins"
            )
        else:
            lines.append(
                f"{prefix}{tss} t1 INFO CommonTiming::Stop {svc} total time {rng.randrange(1, 2000)}"
            )
    d = tmp_path / "logs" / "srvf"
    d.mkdir(parents=True)
    f = d / "server.log"
    f.write_text("\n".join(lines) + "\n")

    def rows(df):
        return sorted(
            (
                r["logid"] or "", r["service"], r["startts"], r["endts"],
                r["elapsed"], r["matched"],
            )
            for r in df.where(df.rectype == "tx").collect()
        )

    want = rows(parse_logs(spark, str(f)))
    assert want  # fuzz actually produced transactions
    for cb in (64, 97, 256, 1024, 4096):
        got = rows(parse_logs_chunked(spark, [str(f)], chunk_bytes=cb))
        assert got == want, (cb, len(got), len(want))
