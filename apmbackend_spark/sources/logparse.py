"""Log-line ingest front end (SURVEY.md §2.2 P1-P10, §2.3 J1-J3): parse
WildFly-style logs into tx records.

Architecture (Spark-first, not a port): each file is parsed SEQUENTIALLY
(line order is load-bearing for entry/exit pairing, SOAP frames and
audit-trail sessions — reference stream_parse_transactions.js:578-731), but
files are independent, so the unit of parallelism is the file: one
`applyInPandas` group per file, wholetext-read. The cross-file work — the
SOAP acctnum enrichment the reference does via TTL caches
(stream_parse_transactions.js:213-239) — becomes an explicit logid JOIN
after parsing (J2), so it scales as a shuffle instead of shared memory.

Per-file grammar handling mirrors the reference semantics:
  * P1 router: filename -> {SOAP, SERVER, APP} (reference :741-791)
  * P2/P3: entry/exit line classification + field extraction
  * P4/U5: dual timestamp formats ('yyyy-MM-dd HH:mm:ss,SSS' and ISO+TZ)
  * P5: Provider[x] -> Provider:x; EJB services prefixed 'S:' (:259,390)
  * P6/P7: toplevel derivation; startts back-fill (:258-282)
  * P8: SOAP frames -> (logid, acctnum), incl. the riskid
    <key>AccountNumber</key>/<value> variant and numeric validation (U9)
  * P9: BAF [..:..:acct] salvage block before INFO
  * P10: audit-trail two-phase parse with FIFO matching of repeated
    subservices between the RequestTrace elapsed list and the
    <stopWatchList> XML (:624-726)
  * J1: entry/exit correlation per (logid, service); exits without entry
    are salvaged with matched='N' (:530-540)
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# precompiled patterns (reference hoists these too, :345,733-739)
RX_LOGID = re.compile(r"^\[([^\]]*)\]\s+")
RX_LOGTS = re.compile(r"(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2}),(\d{3})")
RX_CT_START = re.compile(r"INFO CommonTiming::Start (\S+)")
RX_CT_STOP = re.compile(r"INFO CommonTiming::Stop (\S+).*?total time (\d+)")
RX_EJB_START = re.compile(r"INFO \[CommonTiming\] EJB intercept beginning call (\S+)")
RX_EJB_STOP = re.compile(
    r"INFO \[CommonTiming\] EJB intercept total call (\S+) took ms (\d+)"
)
RX_BAF_ACCT = re.compile(r"\[[^\]]*:[^\]]*:(\d+)\]\s*INFO")
RX_SOAP_FRAME = re.compile(r"^=== jbossId=(\S+) .*IO=([IO])")
RX_ACCT = re.compile(r"<accountNumber>([^<]*)</accountNumber>")
RX_KEY_ACCT = re.compile(r"<key>AccountNumber</key>")
RX_VALUE = re.compile(r"<value>([^<]*)</value>")
RX_AUTR_LINK = re.compile(r"INFO auditTrailId=(\S+)")
RX_AUTR_OPEN = re.compile(r"INFO Audit Trail id : (\S+)")
RX_STOPWATCH_ELAPSED = re.compile(r"^\s*(\S+) :\[(\d+) millis")
RX_SW_XML = re.compile(
    r"<name>([^<]*)</name><startTime>([^<]*)</startTime><stopTime>([^<]*)</stopTime>"
)
RX_NUMERIC = re.compile(r"^[0-9]+$")  # U9 acct validation (:296)
RX_PROVIDER = re.compile(r"^(.*)\[([^\]]*)\]$")


def parse_log_ts(s: str) -> int | None:
    """U5: 'yyyy-MM-dd HH:mm:ss,SSS' -> epoch ms (reference :242-256)."""
    m = RX_LOGTS.search(s)
    if not m:
        return None
    dt = datetime.strptime(f"{m.group(1)} {m.group(2)}", "%Y-%m-%d %H:%M:%S")
    return int(dt.replace(tzinfo=timezone.utc).timestamp()) * 1000 + int(m.group(3))


def parse_iso_ts(s: str) -> int | None:
    """U5 variant: ISO with offset -> epoch ms."""
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        return None
    # exact integer ms: timestamp()*1000 in double can land one ulp below
    # the grid and truncate a millisecond off
    if dt.tzinfo is None:
        # offset-less ISO strings are UTC by convention (same as parse_log_ts)
        dt = dt.replace(tzinfo=timezone.utc)
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    return (dt - epoch) // timedelta(milliseconds=1)


def normalize_service(svc: str) -> str:
    """P5: Provider[x] -> Provider:x (strip ']')."""
    m = RX_PROVIDER.match(svc)
    if m:
        return f"{m.group(1)}:{m.group(2)}"
    return svc


def classify_file(path: str) -> str:
    """P1 router by filename (reference :741-791)."""
    name = path.rsplit("/", 1)[-1]
    if "soap_io" in name:
        return "SOAP"
    if name.startswith("server"):
        return "SERVER"
    return "APP"


def server_from_path(path: str) -> str:
    """Server = parent directory name (reference derives it from a fixed
    path segment, :746-760)."""
    parts = path.rstrip("/").split("/")
    return parts[-2] if len(parts) >= 2 else "unknown"


def parse_file(path: str, lines: list[str]) -> list[dict]:
    """Sequential parse of one file. Emits dicts with rectype in
    {'tx', 'acct'}."""
    server = server_from_path(path)
    ftype = classify_file(path)
    out: list[dict] = []

    if ftype == "SOAP":
        _parse_soap(lines, out)
        return out

    # entry cache keyed (logid, service) — the per-file slice of J1
    pending: dict[tuple[str, str], int] = {}
    # audit-trail session state (P10)
    autr_to_logid: dict[str, str] = {}
    at_logid: str | None = None
    at_elapsed: list[tuple[str, int]] = []
    in_stopwatch_section = False
    in_xml = False

    def emit_tx(logid, service, startts, endts, elapsed, toplevel, altacct, matched):
        out.append(
            {
                "rectype": "tx",
                "server": server,
                "service": service,
                "logid": logid or None,
                "altacct": altacct,
                "startts": startts if startts is not None else endts - elapsed,  # P7
                "endts": endts,
                "elapsed": elapsed,
                "toplevel": toplevel,
                "matched": matched,
            }
        )

    for raw in lines:
        line = raw.rstrip("\n")

        # ---- audit-trail machinery (APP logs) ----
        m = RX_AUTR_LINK.search(line)
        if m:
            lid = RX_LOGID.match(line)
            if lid:
                autr_to_logid[m.group(1)] = lid.group(1)
            continue
        m = RX_AUTR_OPEN.search(line)
        if m:
            at_logid = autr_to_logid.pop(m.group(1), None)  # consumed once (J3)
            at_elapsed = []
            continue
        if line.startswith(": RequestTrace [stopWatchList="):
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
                # FIFO match: first queued elapsed for this subservice name
                for idx, (qname, qel) in enumerate(at_elapsed):
                    if qname == name:
                        at_elapsed.pop(idx)
                        sstart = parse_iso_ts(s_iso)
                        sstop = parse_iso_ts(e_iso)
                        if sstop is not None:
                            emit_tx(
                                at_logid,
                                normalize_service(name),
                                sstart,
                                sstop,
                                qel,
                                "N",
                                None,
                                "Y",
                            )
                        break
            continue

        # ---- CommonTiming (standard + EJB) ----
        lid_m = RX_LOGID.match(line)
        logid = lid_m.group(1) if lid_m else ""
        ts = parse_log_ts(line)

        m = RX_CT_START.search(line) or RX_EJB_START.search(line)
        if m and ts is not None:
            is_ejb = "[CommonTiming]" in line
            service = ("S:" if is_ejb else "") + normalize_service(m.group(1))
            pending[(logid, service)] = ts
            continue
        m = RX_CT_STOP.search(line) or RX_EJB_STOP.search(line)
        if m and ts is not None:
            is_ejb = "[CommonTiming]" in line
            service = ("S:" if is_ejb else "") + normalize_service(m.group(1))
            elapsed = int(m.group(2))
            startts = pending.pop((logid, service), None)
            baf = RX_BAF_ACCT.search(line)  # P9 salvage
            altacct = int(baf.group(1)) if baf else None
            emit_tx(
                logid,
                service,
                startts,
                ts,
                elapsed,
                "Y" if service.startswith("S:") else "N",
                altacct,
                "Y" if startts is not None else "N",
            )
            continue

    return out


def _parse_soap(lines: list[str], out: list[dict]) -> None:
    """P8: stateful per-file scan for (logid, acctnum) pairs."""
    cur_logid: str | None = None
    awaiting_value = False
    for raw in lines:
        line = raw.rstrip("\n")
        m = RX_SOAP_FRAME.match(line)
        if m:
            cur_logid = m.group(1) if m.group(2) == "I" else None
            awaiting_value = False
            continue
        if cur_logid is None:
            continue
        if RX_KEY_ACCT.search(line):
            awaiting_value = True
        if awaiting_value:
            mv = RX_VALUE.search(line)
            if mv:
                _emit_acct(out, cur_logid, mv.group(1))
                awaiting_value = False
                cur_logid = None
                continue
        ma = RX_ACCT.search(line)
        if ma:
            _emit_acct(out, cur_logid, ma.group(1))
            cur_logid = None


def _emit_acct(out: list[dict], logid: str, acct: str) -> None:
    if RX_NUMERIC.match(acct):  # U9 validation
        out.append({"rectype": "acct", "logid": logid, "acctnum": int(acct)})


PARSED_SCHEMA = (
    "rectype string, server string, service string, logid string, "
    "altacct long, startts long, endts long, elapsed long, toplevel string, "
    "matched string, acctnum long"
)


def parse_logs(
    spark: SparkSession,
    glob_path: str,
    max_file_bytes: int = 1 << 30,
) -> DataFrame:
    """Read log files (wholetext, one task per file — S2's glob fan-in) and
    parse each sequentially; returns the union of tx records and acct
    mappings (rectype-tagged).

    Size guard: wholetext makes each file ONE task and ONE in-memory blob —
    right for the reference's ~70 bounded, rotated server logs, but a
    multi-GB stray file would become a straggler task that can OOM an
    executor. Files above ``max_file_bytes`` fail fast with a clear error
    instead; route such APP/SERVER files through
    ``sources.logchunk.parse_logs_chunked`` — the byte-range-split parser
    with exact cross-chunk pair repair (identical output, tasks ∝ bytes) —
    and only SOAP session logs genuinely need the per-file path."""
    raw = spark.read.text(glob_path, wholetext=True).select(
        F.input_file_name().alias("path"), F.col("value")
    )
    raw = raw.withColumn(
        "value",
        F.when(
            F.length("value") > max_file_bytes,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"log file exceeds wholetext size guard ({max_file_bytes} bytes): "
                    ),
                    F.col("path"),
                )
            ),
        ).otherwise(F.col("value")),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for r in pdf.itertuples(index=False):
            rows.extend(parse_file(r.path, r.value.splitlines()))
        cols = [
            "rectype", "server", "service", "logid", "altacct", "startts",
            "endts", "elapsed", "toplevel", "matched", "acctnum",
        ]
        return pd.DataFrame([{c: r.get(c) for c in cols} for r in rows], columns=cols)

    # pinned-count repartition on the grouping key: parse cost tracks line
    # count, not file bytes, so AQE's byte-based coalescing would otherwise
    # collapse small-but-parse-heavy file groups onto one Python worker
    # (the zscore_recursive AQE lesson)
    n_parts = max(raw.sparkSession.sparkContext.defaultParallelism, 32)
    return (
        raw.repartition(n_parts, "path")
        .groupBy("path")
        .applyInPandas(fn, schema=PARSED_SCHEMA)
    )


def enrich_tx(parsed: DataFrame) -> DataFrame:
    """J2 acct enrichment over a PARSED_SCHEMA frame (TTL caches -> shuffle
    join on logid) -> tx records."""
    parsed = parsed.cache()
    tx = parsed.where(F.col("rectype") == "tx").drop("rectype", "acctnum")
    acct = (
        parsed.where(F.col("rectype") == "acct")
        .groupBy("logid")
        .agg(F.min("acctnum").alias("acctnum"))  # first-write-wins
    )
    return (
        tx.join(acct, "logid", "left")
        .select(
            "server",
            "service",
            "logid",
            F.coalesce(F.col("acctnum"), F.col("altacct")).alias("acctnum"),
            "startts",
            "endts",
            "elapsed",
            "toplevel",
            "matched",
        )
    )


def logs_to_tx(spark: SparkSession, glob_path: str) -> DataFrame:
    """Full ingest: parse + J2 acct enrichment join -> tx records."""
    return enrich_tx(parse_logs(spark, glob_path))


# ---------------------------------------------------------------------------
# P2-P5/U5/U9 as a JVM-side SQL extraction pipeline (graded query).
# ---------------------------------------------------------------------------
#
# The per-file applyInPandas parser above is the right shape when line ORDER
# carries meaning (entry/exit pairing, SOAP frames, audit sessions). For the
# simple one-line grammar — CommonTiming stop lines — the same extraction is
# expressible entirely in codegen'd built-ins (regexp_extract/to_timestamp),
# which is the form a 100 TB raw-log lake wants: a stateless line-level scan,
# no Python, no per-file task granularity. `log_extract` grades that
# rendering: log LINES are synthesized deterministically from the tx stream
# in-plan (so the driver needs no log files), then every field is recovered
# with the engine's extraction expressions and checked against a DuckDB
# regexp oracle (reference grammar: stream_parse_transactions.js:345,733-739;
# ts parse :242-256; Provider normalize :259; acct validation :296).

_LOG_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def log_lines_from_tx(tx: DataFrame) -> DataFrame:
    """Deterministic single-line synthesis: one CommonTiming stop line per
    tx with the service re-encoded in its RAW 'Provider[x]' spelling for
    toplevel services (so extraction must re-normalize it), a ~1/7-invalid
    acct token (so U9 validation must reject it), and the ms-precision log
    timestamp format."""
    ts = F.timestamp_millis(F.col("endts"))
    ts_str = F.concat(
        F.date_format(ts, _LOG_TS_FMT),
        F.lit(","),
        F.lpad((F.col("endts") % 1000).cast("string"), 3, "0"),
    )
    svc_raw = F.when(
        F.col("service").startswith("S:"),
        F.concat(F.lit("Provider["), F.expr("substring(service, 3)"), F.lit("]")),
    ).otherwise(F.col("service"))
    acct_raw = F.coalesce(
        F.col("acctnum").cast("string"), F.concat(F.lit("X"), F.col("logid"))
    )
    line = F.concat(
        F.lit("["), F.col("logid"), F.lit("] "),
        ts_str,
        F.lit(" INFO CommonTiming::Stop "), svc_raw,
        F.lit(" server="), F.col("server"),
        F.lit(" <accountNumber>"), acct_raw, F.lit("</accountNumber>"),
        F.lit(" total time "), F.col("elapsed").cast("string"),
    )
    return tx.select(line.alias("line"))


def log_extract(tx: DataFrame) -> DataFrame:
    """Recover (logid, server, service, endts, elapsed, acctnum) from raw
    log-line strings using only whole-stage-codegen built-ins."""
    lines = log_lines_from_tx(tx)
    l = F.col("line")
    date_s = F.regexp_extract(l, r"(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2}),(\d{3})", 1)
    time_s = F.regexp_extract(l, r"(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2}),(\d{3})", 2)
    ms_s = F.regexp_extract(l, r"(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2}),(\d{3})", 3)
    endts = (
        F.unix_millis(
            F.to_timestamp(F.concat(date_s, F.lit(" "), time_s), _LOG_TS_FMT)
        )
        + ms_s.cast("long")
    )
    svc_extracted = F.regexp_extract(l, r"INFO CommonTiming::Stop (\S+)", 1)
    service = F.regexp_replace(
        svc_extracted, r"^(.*)\[([^\]]*)\]$", r"$1:$2"
    )
    acct_s = F.regexp_extract(l, r"<accountNumber>([^<]*)</accountNumber>", 1)
    acctnum = F.when(acct_s.rlike(r"^[0-9]+$"), acct_s.cast("long"))
    return lines.select(
        F.regexp_extract(l, r"^\[([^\]]*)\]", 1).alias("logid"),
        F.regexp_extract(l, r" server=(\S+)", 1).alias("server"),
        service.alias("service"),
        endts.alias("endts"),
        F.regexp_extract(l, r"total time (\d+)", 1).cast("long").alias("elapsed"),
        acctnum.alias("acctnum"),
    )


LOG_EXTRACT_ORACLE = r"""
, lines AS (
    SELECT '[' || logid || '] '
        || strftime(make_timestamp(endts * 1000), '%Y-%m-%d %H:%M:%S')
        || ',' || lpad(CAST(endts % 1000 AS VARCHAR), 3, '0')
        || ' INFO CommonTiming::Stop '
        || CASE WHEN service LIKE 'S:%'
                THEN 'Provider[' || substr(service, 3) || ']'
                ELSE service END
        || ' server=' || server
        || ' <accountNumber>' || COALESCE(CAST(acctnum AS VARCHAR), 'X' || logid) || '</accountNumber>'
        || ' total time ' || CAST(elapsed AS VARCHAR) AS line
    FROM tx
)
SELECT regexp_extract(line, '^\[([^\]]*)\]', 1) AS logid,
       regexp_extract(line, ' server=(\S+)', 1) AS server,
       regexp_replace(
           regexp_extract(line, 'INFO CommonTiming::Stop (\S+)', 1),
           '^(.*)\[([^\]]*)\]$', '\1:\2') AS service,
       epoch_ms(strptime(
           regexp_extract(line, '(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2}),(\d{3})', 1)
           || ' ' ||
           regexp_extract(line, '(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2}),(\d{3})', 2),
           '%Y-%m-%d %H:%M:%S'))
       + CAST(regexp_extract(line, '(\d{4}-\d{2}-\d{2}) (\d{2}:\d{2}:\d{2}),(\d{3})', 3) AS BIGINT)
       AS endts,
       CAST(regexp_extract(line, 'total time (\d+)', 1) AS BIGINT) AS elapsed,
       CASE WHEN regexp_matches(regexp_extract(line, '<accountNumber>([^<]*)</accountNumber>', 1), '^[0-9]+$')
            THEN CAST(regexp_extract(line, '<accountNumber>([^<]*)</accountNumber>', 1) AS BIGINT)
       END AS acctnum
FROM lines
"""


# ---------------------------------------------------------------------------
# P8-P10/J3 under the hard signal: the REAL per-file session parser as a
# graded gate.
# ---------------------------------------------------------------------------
#
# `log_extract` grades the stateless one-line grammar; this gate grades the
# stateful machinery that genuinely needs per-file line order — entry/exit
# pairing with parked starts, SOAP acct frames (P8) + BAF salvage (P9) +
# first-write-wins enrichment (J2 batch form), audit-trail sessions with
# FIFO-matched repeated subservices (P10) and consumed-once autrId->logId
# links (J3). The corpus comes from the deterministic generator
# (sources/loggen.py, seeded; record i derives from i), the engine side is
# the real wholetext applyInPandas parser + enrichment join, and the oracle
# is the generator's golden expectation rendered as a VALUES literal — the
# reference's own test strategy (golden end-to-end) under the driver's
# value-hash compare.


_LOG_GATE_DIR: list[str] = []  # corpus written once per process


def log_sessions_gate(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Graded P8-P10/J3 gate: generate the three-grammar corpus, parse it
    with the real per-file parser, enrich accts. ``sf_dir`` unused by
    design (the corpus is generator-defined, like ``jmx_poll``). The
    corpus is deterministic, so it is written once per process and reused
    on re-invocation (bench re-runs, judge re-grades)."""
    return logs_to_tx(spark, f"{ensure_gate_corpus()}/logs/*/*.log")


def ensure_gate_corpus() -> str:
    """Write the deterministic generator corpus once per process and return
    its root (shared by log_sessions_gate and the chunked-parse gate)."""
    import atexit
    import shutil
    import tempfile

    from apmbackend_spark.sources.loggen import generate

    if not _LOG_GATE_DIR:
        d = tempfile.mkdtemp(prefix="apm_log_gate_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        generate().write(d)
        _LOG_GATE_DIR.append(d)
    return _LOG_GATE_DIR[0]


def log_sessions_oracle_sql() -> str:
    from apmbackend_spark.sources.loggen import generate

    def lit(v, typ):
        if v is None:
            return f"CAST(NULL AS {typ})"
        if typ == "VARCHAR":
            return "'" + str(v).replace("'", "''") + "'"
        return f"CAST({v} AS {typ})"

    cols = (
        ("server", "VARCHAR"),
        ("service", "VARCHAR"),
        ("logid", "VARCHAR"),
        ("acctnum", "BIGINT"),
        ("startts", "BIGINT"),
        ("endts", "BIGINT"),
        ("elapsed", "BIGINT"),
        ("toplevel", "VARCHAR"),
        ("matched", "VARCHAR"),
    )
    rows = ",\n".join(
        "(" + ", ".join(lit(e[c], t) for c, t in cols) + ")"
        for e in generate().expected
    )
    names = ", ".join(c for c, _ in cols)
    return f"SELECT * FROM (VALUES {rows}) AS t({names})"
