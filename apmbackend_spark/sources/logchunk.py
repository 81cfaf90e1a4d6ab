"""Chunked (multi-task-per-file) log parsing — the size fallback for S2.

`logparse.parse_logs` reads each file wholetext: one task, one in-memory
blob. That is right for the reference's ~70 bounded rotated server logs
(stream_parse_transactions.js:10,14) but a multi-GB stray file becomes a
straggler that can OOM an executor. This module parses APP/SERVER logs in
BYTE-RANGE CHUNKS (the classic InputSplit protocol: a chunk owns every
line that STARTS inside [offset, offset+size); the reader skips a partial
first line and runs past its end to finish the last one) while producing
output IDENTICAL to the sequential parse:

  * CT/EJB/BAF stop lines are line-local except for start/stop pairing
    (the `pending` dict). Each chunk parses its lines normally, then emits
    its leftover pending starts (the LAST unconsumed start per key — all
    an earlier start can ever contribute, since a later start overwrites
    it), a 'kill' marker at its FIRST start per key (the offset where a
    start carried from an earlier chunk would be overwritten in the
    sequential parse — required even when this chunk's starts are all
    consumed intra-chunk, else the replay would match the stale carry to
    a later unmatched stop), and marks stops that found no intra-chunk
    start. A per-(path, logid, service) REPLAY over those spill records in
    byte-offset order reproduces the sequential pending-dict outcome
    exactly, and a repair join rewrites the affected stop rows'
    (startts, matched).
  * Audit-trail sessions (P10) and autr links (J3) are inherently
    sequential, but their lines are individually recognizable, so each
    chunk forwards just that (tiny) subsequence and a per-file ordered
    replay runs the session machine — per-file sequential state over ~1%
    of the bytes instead of 100%.
  * SOAP account logs (P8) stay on the wholetext path: nearly every line
    participates in session state, so chunking buys nothing.

Grammar assumption (holds for the reference format by construction): a
RequestTrace stopwatch section contains only stopwatch-dump lines — a
CommonTiming line INSIDE such a section would be ignored by the
sequential parser but parsed by the chunked one.

Scale: tasks ∝ total bytes / chunk_bytes regardless of file count or
size; per-task memory is one chunk + its spill records. The repair join
is broadcast-sized (unmatched ends are rare).
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apmbackend_spark.sources.logparse import (
    PARSED_SCHEMA,
    RX_AUTR_LINK,
    RX_AUTR_OPEN,
    RX_BAF_ACCT,
    RX_CT_START,
    RX_CT_STOP,
    RX_EJB_START,
    RX_EJB_STOP,
    RX_LOGID,
    RX_STOPWATCH_ELAPSED,
    RX_SW_XML,
    classify_file,
    normalize_service,
    parse_file,
    parse_iso_ts,
    parse_log_ts,
    server_from_path,
)

DEFAULT_CHUNK_BYTES = 64 << 20

# chunk-stage output: final tx rows + spill records for the two replays
_CHUNK_SCHEMA = (
    "rectype string, server string, service string, logid string, "
    "altacct long, startts long, endts long, elapsed long, toplevel string, "
    "matched string, acctnum long, okey long, line string"
)


def _list_chunks(paths: list[str], chunk_bytes: int) -> list[tuple[str, int, int]]:
    out = []
    for p in paths:
        size = os.path.getsize(p)
        off = 0
        while off == 0 or off < size:
            out.append((p, off, min(chunk_bytes, max(size - off, 0))))
            off += chunk_bytes
    return out


def _read_chunk_lines(path: str, offset: int, size: int) -> list[tuple[int, str]]:
    """Lines (with their absolute start byte offset) owned by this chunk:
    every line whose first byte lies in [offset, offset+size)."""
    out: list[tuple[int, str]] = []
    with open(path, "rb") as f:
        pos = offset
        if offset > 0:
            f.seek(offset - 1)
            # consume the tail of the previous chunk's last line (which we
            # do not own); if the byte before us is \n we own from offset
            prev = f.read(1)
            if prev != b"\n":
                skipped = f.readline()
                pos = offset - 1 + 1 + len(skipped)
            # else: pos = offset, file positioned there already
        end = offset + size
        while pos < end:
            line = f.readline()
            if not line:
                break
            out.append((pos, line.decode("utf-8", errors="replace").rstrip("\n")))
            pos += len(line)
    return out


_AUDIT_MARKERS = (": RequestTrace [stopWatchList=", "<stopWatchList>", "</stopWatchList>")


def _is_audit_line(line: str) -> bool:
    s = line.strip()
    if s == "]" or s in ("<stopWatchList>", "</stopWatchList>"):
        return True
    if line.startswith(_AUDIT_MARKERS[0]):
        return True
    return bool(
        RX_AUTR_LINK.search(line)
        or RX_AUTR_OPEN.search(line)
        or RX_STOPWATCH_ELAPSED.match(line)
        or RX_SW_XML.search(line)
    )


def _parse_ct_chunk(path: str, lines: list[tuple[int, str]]) -> list[dict]:
    """The CT/EJB/BAF slice of logparse.parse_file over one chunk, plus
    spill records: 'pend' (leftover starts), audit 'aline's. Stops emit as
    tx rows tagged with their okey; unmatched ones carry matched='N' and
    may be repaired later."""
    server = server_from_path(path)
    out: list[dict] = []
    pending: dict[tuple[str, str], tuple[int, int]] = {}  # key -> (okey, ts)
    # first start per key: a pending start carried from an EARLIER chunk is
    # overwritten (killed) at this offset in the sequential parse, even if
    # this chunk's own starts are all consumed intra-chunk — without this
    # marker the replay would wrongly match the stale carry to a later
    # unmatched stop
    first_start: dict[tuple[str, str], int] = {}

    for okey, line in lines:
        if _is_audit_line(line):
            out.append({"rectype": "aline", "okey": okey, "line": line})
            continue
        lid_m = RX_LOGID.match(line)
        logid = lid_m.group(1) if lid_m else ""
        ts = parse_log_ts(line)
        m = RX_CT_START.search(line) or RX_EJB_START.search(line)
        if m and ts is not None:
            is_ejb = "[CommonTiming]" in line
            service = ("S:" if is_ejb else "") + normalize_service(m.group(1))
            first_start.setdefault((logid, service), okey)
            pending[(logid, service)] = (okey, ts)
            continue
        m = RX_CT_STOP.search(line) or RX_EJB_STOP.search(line)
        if m and ts is not None:
            is_ejb = "[CommonTiming]" in line
            service = ("S:" if is_ejb else "") + normalize_service(m.group(1))
            elapsed = int(m.group(2))
            got = pending.pop((logid, service), None)
            baf = RX_BAF_ACCT.search(line)
            out.append(
                {
                    "rectype": "tx",
                    "server": server,
                    "service": service,
                    "logid": logid or None,
                    "altacct": int(baf.group(1)) if baf else None,
                    "startts": got[1] if got else ts - elapsed,  # P7 fallback
                    "endts": ts,
                    "elapsed": elapsed,
                    "toplevel": "Y" if service.startswith("S:") else "N",
                    "matched": "Y" if got else "N",
                    "okey": okey,
                }
            )
    for (logid, service), (okey, ts) in pending.items():
        out.append(
            {
                "rectype": "pend",
                "server": server,
                "service": service,
                "logid": logid or None,
                "startts": ts,
                "okey": okey,
            }
        )
    for (logid, service), okey in first_start.items():
        out.append(
            {
                "rectype": "kill",
                "service": service,
                "logid": logid or None,
                "okey": okey,
            }
        )
    return out


def _replay_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
    """Cross-chunk pairing replay for ONE (path, logid, service): leftover
    starts and unmatched stops in byte order through the pending-dict
    recurrence; returns (okey, startts) repairs for stops that match."""
    # (okey, rectype) order: at equal okey (a chunk's first start IS its
    # leftover start) the 'kill' must apply before the 'pend' re-arms the
    # slot — lexicographic rectype order gives kill < pend < tx
    pdf = pdf.sort_values(["okey", "rectype"])
    pending_ts = None
    rep_okey, rep_ts = [], []
    for r in pdf.itertuples(index=False):
        if r.rectype == "pend":
            pending_ts = r.startts
        elif r.rectype == "kill":
            # a later chunk's first start overwrites the carried slot in
            # the sequential parse — even when that start was consumed
            # intra-chunk and never spilled as a pend
            pending_ts = None
        else:  # unmatched stop
            if pending_ts is not None:
                rep_okey.append(r.okey)
                rep_ts.append(pending_ts)
                pending_ts = None
    return pd.DataFrame({"path": pdf["path"].iloc[:len(rep_okey)], "okey": rep_okey, "startts": rep_ts})


def _replay_audit(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-file ordered replay of the audit-session machine over the
    forwarded audit lines (identical branches to logparse.parse_file)."""
    pdf = pdf.sort_values("okey")
    path = pdf["path"].iloc[0]
    server = server_from_path(path)
    out: list[dict] = []

    autr_to_logid: dict[str, str] = {}
    at_logid = None
    at_elapsed: list[tuple[str, int]] = []
    in_stopwatch_section = False
    in_xml = False
    for line in pdf["line"].tolist():
        m = RX_AUTR_LINK.search(line)
        if m:
            lid = RX_LOGID.match(line)
            if lid:
                autr_to_logid[m.group(1)] = lid.group(1)
            continue
        m = RX_AUTR_OPEN.search(line)
        if m:
            at_logid = autr_to_logid.pop(m.group(1), None)
            at_elapsed = []
            continue
        if line.startswith(_AUDIT_MARKERS[0]):
            in_stopwatch_section = True
            continue
        if in_stopwatch_section:
            if line.strip() == "]":
                in_stopwatch_section = False
            else:
                m = RX_STOPWATCH_ELAPSED.match(line)
                if m:
                    at_elapsed.append((m.group(1), int(m.group(2))))
            continue
        if line.strip() == "<stopWatchList>":
            in_xml = True
            continue
        if in_xml:
            if line.strip() == "</stopWatchList>":
                in_xml = False
                at_logid, at_elapsed = None, []
                continue
            m = RX_SW_XML.search(line)
            if m and at_elapsed:
                name, s_iso, e_iso = m.groups()
                for idx, (qname, qel) in enumerate(at_elapsed):
                    if qname == name:
                        at_elapsed.pop(idx)
                        sstart = parse_iso_ts(s_iso)
                        sstop = parse_iso_ts(e_iso)
                        if sstop is not None:
                            out.append(
                                {
                                    "rectype": "tx",
                                    "server": server,
                                    "service": normalize_service(name),
                                    "logid": at_logid,
                                    "altacct": None,
                                    "startts": sstart,
                                    "endts": sstop,
                                    "elapsed": qel,
                                    "toplevel": "N",
                                    "matched": "Y",
                                    "acctnum": None,
                                }
                            )
                        break
            continue
    cols = [
        "rectype", "server", "service", "logid", "altacct", "startts",
        "endts", "elapsed", "toplevel", "matched", "acctnum",
    ]
    return pd.DataFrame([{c: r.get(c) for c in cols} for r in out], columns=cols)


def parse_logs_chunked(
    spark: SparkSession,
    paths: list[str],
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
) -> DataFrame:
    """Multi-task parse of APP/SERVER log files; same output contract as
    `logparse.parse_logs` restricted to those files (SOAP files in `paths`
    are rejected — route them to the wholetext path)."""
    soap = [p for p in paths if classify_file(p) == "SOAP"]
    if soap:
        raise ValueError(f"SOAP logs need per-file session state: {soap[:3]}")
    chunks = _list_chunks(paths, int(chunk_bytes))
    cdf = spark.createDataFrame(chunks, "path string, off long, size long")
    # spread chunk descriptors so each task owns one chunk read
    cdf = cdf.repartition(max(len(chunks), 1))

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for r in pdf.itertuples(index=False):
            lines = _read_chunk_lines(r.path, int(r.off), int(r.size))
            for rec in _parse_ct_chunk(r.path, lines):
                rec["path"] = r.path
                rows.append(rec)
        cols = [
            "path", "rectype", "server", "service", "logid", "altacct",
            "startts", "endts", "elapsed", "toplevel", "matched", "acctnum",
            "okey", "line",
        ]
        return pd.DataFrame(
            [{c: r.get(c) for c in cols} for r in rows], columns=cols
        )

    # pinned repartition: chunk groups are bytes-tiny but parse-heavy, so
    # AQE byte-coalescing would serialize the per-chunk scans (the
    # zscore_recursive AQE lesson)
    n_parts = max(cdf.sparkSession.sparkContext.defaultParallelism, 32)
    scanned = (
        cdf.repartition(n_parts, "path", "off")
        .groupBy("path", "off")
        .applyInPandas(scan, schema="path string, " + _CHUNK_SCHEMA)
        .persist()
    )

    tx = scanned.where(F.col("rectype") == "tx")
    # cross-chunk pairing repair: leftover starts + kill markers + unmatched
    # stops replay the sequential pending-dict recurrence. Kill/stop records
    # only matter for keys that actually carry a pend across chunks, so both
    # are pruned by a broadcast semi-join against the (small) pend key set —
    # the shuffle into the replay stays bounded by leftover-start volume,
    # not by per-chunk key counts.
    pend = scanned.where(F.col("rectype") == "pend").select(
        "path", "rectype", "logid", "service", "okey", "startts"
    )
    pend_keys = pend.select(
        F.col("path").alias("pk_path"),
        F.col("logid").alias("pk_logid"),
        F.col("service").alias("pk_service"),
    ).distinct()
    others = (
        scanned.where(
            (F.col("rectype") == "kill")
            | ((F.col("rectype") == "tx") & (F.col("matched") == "N"))
        )
        .select("path", "rectype", "logid", "service", "okey", "startts")
        # NULL-SAFE on logid: lines with no [logid] prefix parse to logid
        # NULL, and the replay's groupBy groups NULLs together — a
        # null-unsafe semi-join would drop their kill/stop records while
        # the pend passes through, breaking chunked == sequential for
        # cross-chunk pairs on such keys.
        .join(
            F.broadcast(pend_keys),
            (F.col("path") == F.col("pk_path"))
            & F.col("logid").eqNullSafe(F.col("pk_logid"))
            & (F.col("service") == F.col("pk_service")),
            "left_semi",
        )
    )
    spill = pend.unionByName(others)
    repairs = spill.groupBy("path", "logid", "service").applyInPandas(
        lambda pdf: _replay_pairs(pdf),
        schema="path string, okey long, startts long",
    )
    rep = repairs.select(
        "path", "okey", F.col("startts").alias("__rep_startts")
    )
    tx_fixed = (
        tx.join(F.broadcast(rep), ["path", "okey"], "left")
        .select(
            F.lit("tx").alias("rectype"),
            "server",
            "service",
            "logid",
            "altacct",
            F.coalesce(F.col("__rep_startts"), F.col("startts")).alias("startts"),
            "endts",
            "elapsed",
            "toplevel",
            F.when(F.col("__rep_startts").isNotNull(), F.lit("Y"))
            .otherwise(F.col("matched"))
            .alias("matched"),
            F.col("acctnum").cast("long").alias("acctnum"),
        )
    )

    audit = scanned.where(F.col("rectype") == "aline").select(
        "path", "okey", "line"
    )
    audit_tx = audit.groupBy("path").applyInPandas(
        lambda pdf: _replay_audit(pdf), schema=PARSED_SCHEMA
    )
    return tx_fixed.unionByName(audit_tx)


def log_chunked_gate(
    spark: SparkSession,
    sf_dir: str | None = None,
    chunk_bytes: int = 1 << 10,
) -> DataFrame:
    """Graded S2 chunked-parse gate: the deterministic generator corpus is
    ingested with the PRODUCTION file-size routing — SOAP session logs on
    the wholetext path, every APP/SERVER log through the byte-range
    CHUNKED parser at an adversarial 1 KiB chunk size (each file splits
    into many task-owned chunks, forcing cross-chunk start/stop repair and
    the ordered audit replay) — then J2-enriched. The output is graded
    against the SAME golden-expectation VALUES oracle as ``log_sessions``,
    proving chunked == sequential on the graded corpus under the hard
    signal, not just in pytest. ``sf_dir`` unused by design (the corpus is
    generator-defined, like ``jmx_poll``).

    Reference parity: stream_parse_transactions.js tails whole files; the
    chunk protocol is this engine's scale path for oversized files (tasks
    ∝ bytes, memory ∝ chunk), with output identical by construction."""
    import glob as globmod

    from apmbackend_spark.sources import logparse as lp

    root = lp.ensure_gate_corpus()
    paths = sorted(globmod.glob(f"{root}/logs/*/*.log"))
    soap = [p for p in paths if classify_file(p) == "SOAP"]
    rest = [p for p in paths if classify_file(p) != "SOAP"]
    parsed_soap = lp.parse_logs(spark, soap)
    parsed_rest = parse_logs_chunked(spark, rest, chunk_bytes=int(chunk_bytes))
    return lp.enrich_tx(parsed_soap.unionByName(parsed_rest))


def log_chunked_oracle_sql() -> str:
    """Same golden expectation as log_sessions: the chunked parse must be
    indistinguishable from the sequential one on the graded corpus."""
    from apmbackend_spark.sources import logparse as lp

    return lp.log_sessions_oracle_sql()
