"""Correlation joins (SURVEY.md J1-J2; reference
``stream_parse_transactions.js:213-239,294-327,378-565``).

The reference correlates log lines in TTL'd caches:
  * J1 — entry/exit correlation: an *entry* line stores a partial record
    keyed (logid, service); the *exit* line joins it into a full tx.
    Unmatched entries expire and are discarded; exits without an entry are
    salvaged as incomplete records (reference :530-540). Batch form: exits
    LEFT JOIN entries on (logid, service).
  * J2 — account-number enrichment: a completed tx looks up the SOAP-derived
    (logid -> acctnum) mapping; on miss it is parked, and after TTL emitted
    with the BAF-salvaged alternative or empty (reference :226-239). Batch
    form: tx LEFT JOIN mapping + coalesce(acct, altacct).

Batch legs are derived deterministically from the tx stream (the driver's
fixture has no separate entry/exit files): a tx's entry leg is missing when
bigint(logid) % 13 = 0 (cache expiry), its exit leg when % 17 = 0 (service
never returned), and the BAF-salvage altacct exists when % 3 = 0.

Scale: both joins are high-cardinality equi-joins on logid — sort-merge
joins over hash-partitioned inputs, no driver state, AQE handles skew. No
broadcast: the probe and build sides are the same order of magnitude by
construction (unlike the config dims in alerts.py, which do broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entry_leg(tx: DataFrame) -> DataFrame:
    """Entry lines: (logid, service) -> partial {server, startts}
    (reference :392-400,469-482)."""
    return tx.where(F.col("logid").cast("long") % 13 != 0).select(
        "logid",
        "service",
        F.col("server").alias("entry_server"),
        F.coalesce(F.col("startts"), F.col("endts") - F.col("elapsed")).alias("startts"),
    )


def exit_leg(tx: DataFrame) -> DataFrame:
    """Exit lines carry server, endts, elapsed (reference :403-446)."""
    return tx.where(F.col("logid").cast("long") % 17 != 0).select(
        "logid", "service", "server", "endts", "elapsed"
    )


def correlate(entries: DataFrame, exits: DataFrame) -> DataFrame:
    """J1: exit-side left-outer join; unmatched exits are salvaged with a
    back-filled startts and matched='N' (reference :530-540). Entries with
    no exit vanish (cache expiry, reference :220-224)."""
    joined = exits.join(entries, ["logid", "service"], "left")
    return joined.select(
        "logid",
        "service",
        "server",
        F.coalesce(F.col("startts"), F.col("endts") - F.col("elapsed")).alias("startts"),
        "endts",
        "elapsed",
        F.when(F.col("startts").isNotNull(), F.lit("Y")).otherwise(F.lit("N")).alias("matched"),
    )


CORRELATE_ORACLE = """
, entries AS (
    SELECT logid, service, server AS entry_server,
           COALESCE(startts, endts - elapsed) AS startts
    FROM tx WHERE CAST(logid AS BIGINT) % 13 <> 0
), exits AS (
    SELECT logid, service, server, endts, elapsed
    FROM tx WHERE CAST(logid AS BIGINT) % 17 <> 0
)
SELECT x.logid, x.service, x.server,
       COALESCE(e.startts, x.endts - x.elapsed) AS startts,
       x.endts, x.elapsed,
       CASE WHEN e.startts IS NOT NULL THEN 'Y' ELSE 'N' END AS matched
FROM exits x LEFT JOIN entries e USING (logid, service)
"""


def acct_mapping(tx: DataFrame) -> DataFrame:
    """The SOAP-extracted logid->acctnum mapping stream (reference P8)."""
    return tx.where(F.col("acctnum").isNotNull()).select("logid", "acctnum")


def acct_enrich(tx: DataFrame) -> DataFrame:
    """J2: left join + parked-record fallback chain
    coalesce(mapped, baf_alt, null) (reference :226-239,294-327)."""
    mapping = acct_mapping(tx)
    stripped = tx.select(
        "logid",
        "service",
        "server",
        "endts",
        F.when(F.col("logid").cast("long") % 3 == 0, F.lit(900000000) + F.col("logid").cast("long"))
        .alias("altacct"),
    )
    joined = stripped.join(mapping, "logid", "left")
    return joined.select(
        "logid",
        "service",
        "server",
        "endts",
        F.coalesce(F.col("acctnum"), F.col("altacct")).alias("acct"),
        F.when(F.col("acctnum").isNotNull(), F.lit("soap"))
        .when(F.col("altacct").isNotNull(), F.lit("baf"))
        .otherwise(F.lit("none"))
        .alias("acct_source"),
    )


def gauge_asof(tx: DataFrame, gauges: DataFrame) -> DataFrame:
    """As-of join: each tx picks up the LATEST JVM gauge sample at-or-before
    its endts on the same server (the "what was the box doing when this
    request finished" enrichment; gauge stream = S5 collector output).

    Scale shape — the union + carry-forward pattern, not a range join:
    tag both streams, union, ONE shuffle on server, then
    `last(gauge, ignorenulls)` over an ordered running window copies each
    gauge forward to the tx rows that follow it. Cost is one sort per
    server partition; a naive inequality join is |tx| x |gauges-per-server|
    rows before its filter, and Spark would plan it as a broadcast
    nested-loop. Ties (gauge at exactly endts) count as "before": gauge
    rows sort ahead of tx rows on equal ts.

    Per-server history lives in one task; for 100 TB spans, chunk by
    (server, time-slice) with a one-gauge carry into each slice — same
    mitigation as the z-score history chunking (zscore.py module docs)."""
    g = gauges.select(
        "server",
        F.col("timestamp").alias("ts"),
        F.lit(0).alias("is_tx"),
        F.lit(None).cast("string").alias("logid"),
        F.lit(None).cast("long").alias("elapsed"),
        F.col("timestamp").alias("gauge_ts"),
        "heapused",
        "threadcnt",
    )
    t = tx.select(
        "server",
        F.col("endts").alias("ts"),
        F.lit(1).alias("is_tx"),
        "logid",
        "elapsed",
        F.lit(None).cast("long").alias("gauge_ts"),
        F.lit(None).cast("long").alias("heapused"),
        F.lit(None).cast("int").alias("threadcnt"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("server")
        .orderBy("ts", "is_tx", "logid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = g.unionAll(t)
    carried = u.select(
        "server",
        "ts",
        "is_tx",
        "logid",
        "elapsed",
        F.last("gauge_ts", ignorenulls=True).over(w).alias("gauge_ts"),
        F.last("heapused", ignorenulls=True).over(w).alias("heapused"),
        F.last("threadcnt", ignorenulls=True).over(w).alias("threadcnt"),
    )
    return carried.where(F.col("is_tx") == 1).select(
        "logid",
        "server",
        F.col("ts").alias("endts"),
        "elapsed",
        "gauge_ts",
        "heapused",
        "threadcnt",
    )


# DuckDB has a native ASOF JOIN; `endts >= timestamp` picks the greatest
# gauge timestamp at-or-before each tx — the same tie rule as the
# carry-forward ordering above. jx CTE = zerofill.jmx_gauges formulas.
GAUGE_ASOF_ORACLE = """
, jx AS (
    SELECT (endts - endts % 60000) AS timestamp, server,
           CAST(100000000 + SUM(elapsed) * 1000 AS BIGINT) AS heapused,
           CAST(COUNT(*) * 7 AS INT) AS threadcnt
    FROM tx GROUP BY 1, 2
)
SELECT t.logid, t.server, t.endts, t.elapsed,
       g.timestamp AS gauge_ts, g.heapused, g.threadcnt
FROM tx t ASOF LEFT JOIN jx g
  ON t.server = g.server AND t.endts >= g.timestamp
"""


ACCT_ENRICH_ORACLE = """
, mapping AS (
    SELECT logid, acctnum FROM tx WHERE acctnum IS NOT NULL
), stripped AS (
    SELECT logid, service, server, endts,
           CASE WHEN CAST(logid AS BIGINT) % 3 = 0
                THEN 900000000 + CAST(logid AS BIGINT) END AS altacct
    FROM tx
)
SELECT s.logid, s.service, s.server, s.endts,
       COALESCE(m.acctnum, s.altacct) AS acct,
       CASE WHEN m.acctnum IS NOT NULL THEN 'soap'
            WHEN s.altacct IS NOT NULL THEN 'baf'
            ELSE 'none' END AS acct_source
FROM stripped s LEFT JOIN mapping m USING (logid)
"""


# ---------------------------------------------------------------------------
# Interval containment join — the scale-correct range-join pattern.
# ---------------------------------------------------------------------------

# Generic default for interval_join. Choose bucket_ms ~ the MEDIAN INTERVAL
# SPAN of the actual workload: too-large buckets pre-pair a probe row with
# every interval sharing its bucket (per-bucket quadratic before the
# residual filter); too-small buckets inflate the interval explode
# (span/bucket rows per interval).
INTERVAL_BUCKET_MS = 3_600_000
# incident_windows sessions close after a 5-minute silence gap, so typical
# spans are minutes — bucket accordingly (NOT the generic hour default:
# a 6h bucket would pre-pair each tx row with every error session in the
# same quarter-day on that server).
INCIDENT_BUCKET_MS = 600_000


def interval_join(
    intervals: DataFrame,
    probe: DataFrame,
    keys: list[str],
    start_col: str = "session_start",
    end_col: str = "session_end",
    ts_col: str = "endts",
    bucket_ms: int = INTERVAL_BUCKET_MS,
) -> DataFrame:
    """Containment join ``probe.ts in [interval.start, interval.end)`` on
    shared equi-keys, planned as an EQUI-join — never a nested-loop theta
    join (which Spark would otherwise pick and which is O(n*m) per key).

    Pattern: each interval explodes to the time buckets it covers
    (``start div B .. (end-1) div B``), each probe row maps to its single
    bucket, the join runs hash/sort-merge on (keys, bucket), and the exact
    range predicate remains as a residual filter. Each qualifying
    (interval, row) pair matches in EXACTLY one bucket — the probe row's
    own — so no dedup is needed. Shuffle is ∝ rows + intervals×buckets;
    pick ``bucket_ms`` near the median interval span so the explode factor
    stays O(1).

    Returns interval columns + probe's non-key columns prefixed ``probe_``.
    """
    seq = F.sequence(
        F.expr(f"{start_col} div {bucket_ms}"),
        F.expr(f"({end_col} - 1) div {bucket_ms}"),
    )
    iv = (
        intervals.where(F.col(end_col) > F.col(start_col))
        .withColumn("__bucket", F.explode(seq))
        .alias("iv")
    )
    pr = probe.withColumn(
        "__bucket", F.expr(f"{ts_col} div {bucket_ms}")
    ).alias("pr")
    cond = F.col("iv.__bucket") == F.col("pr.__bucket")
    for k in keys:
        cond = cond & (F.col(f"iv.{k}") == F.col(f"pr.{k}"))
    cond = (
        cond
        & (F.col(f"pr.{ts_col}") >= F.col(f"iv.{start_col}"))
        & (F.col(f"pr.{ts_col}") < F.col(f"iv.{end_col}"))
    )
    out_iv = [F.col(f"iv.{c}") for c in intervals.columns]
    out_pr = [
        F.col(f"pr.{c}").alias(f"probe_{c}")
        for c in probe.columns
        if c not in keys
    ]
    return iv.join(pr, cond).select(*out_iv, *out_pr)


INCIDENT_SERVICE = "error"


def incident_windows(
    tx: DataFrame,
    incident_service: str = INCIDENT_SERVICE,
    gap_minutes: float | None = None,
    bucket_ms: int = INCIDENT_BUCKET_MS,
) -> DataFrame:
    """Incident-window attribution: for every gap-session of the incident
    service on a server, count ALL services' traffic on that server inside
    the window [session_start, session_end) — "what else was happening on
    this host during the error burst". Composition: sessionize → filter →
    interval_join → per-window rollup."""
    from apmbackend_spark.operators.sessions import (
        DEFAULT_GAP_MINUTES,
        sessionize,
    )

    gap = DEFAULT_GAP_MINUTES if gap_minutes is None else gap_minutes
    sess = (
        sessionize(tx, gap)
        .where(F.col("service") == incident_service)
        .select("server", "session_start", "session_end")
    )
    pairs = interval_join(
        sess,
        tx.select("server", "service", "endts"),
        keys=["server"],
        bucket_ms=bucket_ms,
    )
    return pairs.groupBy("server", "session_start", "session_end").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("probe_service").alias("n_services"),
    )


def incident_windows_oracle_sql(
    incident_service: str = INCIDENT_SERVICE,
    gap_minutes: float | None = None,
) -> str:
    """Twin as a plain theta join (DuckDB handles the O(n*m)-per-key form
    fine at oracle scale; the Spark side MUST NOT plan it that way)."""
    from apmbackend_spark.operators.sessions import (
        DEFAULT_GAP_MINUTES,
        sessionize_oracle_ctes,
    )

    gap = DEFAULT_GAP_MINUTES if gap_minutes is None else gap_minutes
    return (
        sessionize_oracle_ctes(gap)
        + f"""
, incidents AS (
    SELECT server, session_start, session_end
    FROM sessions WHERE service = '{incident_service}'
)
SELECT i.server, i.session_start, i.session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT t.service) AS BIGINT) AS n_services
FROM incidents i
JOIN tx t ON t.server = i.server
         AND t.endts >= i.session_start
         AND t.endts < i.session_end
GROUP BY i.server, i.session_start, i.session_end
"""
    )


def gauge_interpolate(tx: DataFrame, gauges: DataFrame) -> DataFrame:
    """Linear interpolation of the heap gauge at each tx's endts — the
    time-series companion to `gauge_asof`: instead of carrying the latest
    sample forward, estimate the value AT the event time from the samples
    bracketing it: h(t) = h_prev + (h_next - h_prev) * (t-t_prev)/(t_next-t_prev).

    Scale shape: the same union + one-shuffle-per-server ordered window as
    gauge_asof, run in BOTH directions (last-ignorenulls over the preceding
    frame for the bracket start, first-ignorenulls over the following frame
    for the bracket end) — still one sort per server partition, no range
    join. Tie rule matches gauge_asof: a gauge at exactly endts is the
    "prev" sample (gauge rows order before tx rows at equal ts), so the
    "next" bracket is strictly after. Edge rows fall back to the one
    existing bracket (flat extrapolation).

    Float contract: the interpolation is (exact long subtraction) x (one
    exactly-rounded division) with one multiply and one add, in a fixed
    order — bit-identical across engines (no cross-row float accumulation).
    """
    from pyspark.sql import Window

    g = gauges.select(
        "server",
        F.col("timestamp").alias("ts"),
        F.lit(0).alias("is_tx"),
        F.lit(None).cast("string").alias("logid"),
        F.col("timestamp").alias("gts"),
        F.col("heapused").alias("h"),
    )
    t = tx.select(
        "server",
        F.col("endts").alias("ts"),
        F.lit(1).alias("is_tx"),
        "logid",
        F.lit(None).cast("long").alias("gts"),
        F.lit(None).cast("long").alias("h"),
    )
    back = (
        Window.partitionBy("server")
        .orderBy("ts", "is_tx", "logid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # The "next" bracket is a RUNNING last() over the REVERSED sort, not a
    # first() over an unbounded-FOLLOWING frame: Spark evaluates running
    # (preceding..current) frames in one streaming pass per partition,
    # while an unbounded-following first(ignorenulls) re-scans the frame
    # per row — measured ~O(n^2): 100 s at sf0.1 vs ~4 s for this form.
    # Tie rule is preserved: at equal ts the reverse sort (is_tx DESC)
    # places the gauge AFTER the tx row, so an at-endts gauge is excluded
    # from the tx's running frame — it stays "prev", never "next".
    fwd_rev = (
        Window.partitionBy("server")
        .orderBy(
            F.col("ts").desc(), F.col("is_tx").desc(), F.col("logid").desc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = g.unionAll(t).select(
        "server",
        "ts",
        "is_tx",
        "logid",
        F.last("gts", ignorenulls=True).over(back).alias("prev_ts"),
        F.last("h", ignorenulls=True).over(back).alias("prev_h"),
        F.last("gts", ignorenulls=True).over(fwd_rev).alias("next_ts"),
        F.last("h", ignorenulls=True).over(fwd_rev).alias("next_h"),
    )
    both = F.col("prev_h").isNotNull() & F.col("next_h").isNotNull()
    ratio = (F.col("ts") - F.col("prev_ts")).cast("double") / (
        F.col("next_ts") - F.col("prev_ts")
    ).cast("double")
    interp = (
        F.when(
            both & (F.col("next_ts") > F.col("prev_ts")),
            F.col("prev_h").cast("double")
            + (F.col("next_h") - F.col("prev_h")).cast("double") * ratio,
        )
        .when(F.col("prev_h").isNotNull(), F.col("prev_h").cast("double"))
        .otherwise(F.col("next_h").cast("double"))
    )
    return u.where(F.col("is_tx") == 1).select(
        "logid",
        "server",
        F.col("ts").alias("endts"),
        "prev_ts",
        "next_ts",
        interp.alias("heap_interp"),
    )


# Twin rendering: identical union + bidirectional IGNORE NULLS windows in
# DuckDB (no native bidirectional ASOF), identical float-op order.
GAUGE_INTERPOLATE_ORACLE = """
, jx AS (
    SELECT (endts - endts % 60000) AS timestamp, server,
           CAST(100000000 + SUM(elapsed) * 1000 AS BIGINT) AS heapused
    FROM tx GROUP BY 1, 2
), u AS (
    SELECT server, timestamp AS ts, 0 AS is_tx,
           CAST(NULL AS VARCHAR) AS logid,
           timestamp AS gts, heapused AS h
    FROM jx
    UNION ALL
    SELECT server, endts, 1, logid,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM tx
), c AS (
    SELECT server, ts, is_tx, logid,
           last_value(gts IGNORE NULLS) OVER w_back AS prev_ts,
           last_value(h IGNORE NULLS) OVER w_back AS prev_h,
           first_value(gts IGNORE NULLS) OVER w_fwd AS next_ts,
           first_value(h IGNORE NULLS) OVER w_fwd AS next_h
    FROM u
    WINDOW
      w_back AS (PARTITION BY server ORDER BY ts, is_tx, logid
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_fwd AS (PARTITION BY server ORDER BY ts, is_tx, logid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT logid, server, ts AS endts, prev_ts, next_ts,
       CASE
         WHEN prev_h IS NOT NULL AND next_h IS NOT NULL AND next_ts > prev_ts
         THEN CAST(prev_h AS DOUBLE)
              + CAST(next_h - prev_h AS DOUBLE)
                * (CAST(ts - prev_ts AS DOUBLE) / CAST(next_ts - prev_ts AS DOUBLE))
         WHEN prev_h IS NOT NULL THEN CAST(prev_h AS DOUBLE)
         ELSE CAST(next_h AS DOUBLE)
       END AS heap_interp
FROM c WHERE is_tx = 1
"""


# ---------------------------------------------------------------------------
# Maximal-overlap interval union (incident coalescing).
# ---------------------------------------------------------------------------

# Deterministic incident derivation from the fixture: high-value events
# open an interval of cents*IU_MS_PER_CENT ms (exact integers end to end).
# Tuned so BOTH driver SFs exercise merged AND singleton islands
# (sf0.001: 300 islands / 389 intervals; sf0.01: 392 / 3665).
IU_VALUE_MIN = 50.0
IU_MS_PER_CENT = 800


def interval_union(events: DataFrame) -> DataFrame:
    """Merge overlapping/chained intervals per event_type into maximal
    islands — the 'coalesce incidents' primitive behind uptime math,
    maintenance-window dedup, and on-call paging (N raw alarms -> one
    incident). Distinct from gap sessionization (points + fixed gap) and
    from the containment join (interval x point): here the inputs
    themselves are intervals and the union is by actual overlap chains.

    Algorithm: per key, order intervals by (start, event_id); an interval
    starts a new island iff its start exceeds the running max of all
    previous ends (a prefix max is order-insensitive within equal starts,
    so ties cannot flip membership); island id = running count of starts.
    Within an island coverage is contiguous by construction, so
    covered_ms = island_end - island_start exactly.

    Plan shape: ONE shuffle (the per-key window) then a map-side
    combinable rollup on (key, island). No global sort, no join. The
    streaming flip is session_window with a per-row dynamic gap.
    """
    from pyspark.sql import Window

    iv = events.where(F.col("value") > F.lit(IU_VALUE_MIN)).select(
        "event_type",
        "event_id",
        F.unix_millis("ts").alias("start_ms"),
        (
            F.unix_millis("ts")
            + F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
                "long"
            )
            * F.lit(IU_MS_PER_CENT)
        ).alias("end_ms"),
    )
    w = Window.partitionBy("event_type").orderBy("start_ms", "event_id")
    prev_max_end = F.max("end_ms").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "is_new",
        F.when(
            prev_max_end.isNull() | (F.col("start_ms") > prev_max_end),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("event_type", "island")
        .agg(
            F.min("start_ms").alias("island_start_ms"),
            F.max("end_ms").alias("island_end_ms"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .select(
            "event_type",
            F.col("island").cast("long").alias("island"),
            "island_start_ms",
            "island_end_ms",
            "n_intervals",
            (F.col("island_end_ms") - F.col("island_start_ms")).alias(
                "covered_ms"
            ),
        )
    )


def interval_union_oracle_sql() -> str:
    return f"""
WITH iv AS (
    SELECT event_type, event_id,
           epoch_ms(ts) AS start_ms,
           epoch_ms(ts)
               + CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                 * {IU_MS_PER_CENT}
               AS end_ms
    FROM events WHERE value > {IU_VALUE_MIN!r}
), flagged AS (
    SELECT event_type, event_id, start_ms, end_ms,
           CASE WHEN MAX(end_ms) OVER w IS NULL
                     OR start_ms > MAX(end_ms) OVER w
                THEN 1 ELSE 0 END AS is_new
    FROM iv
    WINDOW w AS (PARTITION BY event_type ORDER BY start_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), islands AS (
    -- the SAME (start_ms, event_id) tie order as the flag pass: a tied
    -- pair can carry (is_new 1, 0), and a different cumsum order would
    -- shift which row opens the island
    SELECT event_type, start_ms, end_ms,
           SUM(is_new) OVER (PARTITION BY event_type
                             ORDER BY start_ms, event_id
                             ROWS UNBOUNDED PRECEDING) AS island
    FROM flagged
)
SELECT event_type,
       CAST(island AS BIGINT) AS island,
       MIN(start_ms) AS island_start_ms,
       MAX(end_ms) AS island_end_ms,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       MAX(end_ms) - MIN(start_ms) AS covered_ms
FROM islands
GROUP BY event_type, island
"""


# ---------------------------------------------------------------------------
# Nearest-event temporal join (direction-agnostic as-of with tolerance)
# ---------------------------------------------------------------------------

NEAREST_TOL_MS = 100_000
# time-slice for the partitioning key: parallelism = |servers| x |slices|
# instead of |servers| alone (a per-server global sort stops scaling the
# moment one server's history outgrows a task). EXACT for tol_ms <
# NEAREST_SLICE_MS because every candidate within tolerance of a slice
# boundary is replicated into the adjacent slice (below).
NEAREST_SLICE_MS = 21_600_000  # 6 h


def nearest_event_join(
    tx: DataFrame,
    gauges: DataFrame,
    tol_ms: int = NEAREST_TOL_MS,
    slice_ms: int = NEAREST_SLICE_MS,
) -> DataFrame:
    """Each tx picks the NEAREST gauge sample on its server within
    ``tol_ms`` — earlier OR later (pandas ``merge_asof(direction=
    'nearest')`` semantics; ties at equal distance resolve BACKWARD).
    ``gauge_asof`` above answers "what was the box doing at-or-before";
    this is the sensor-alignment variant for sparse/irregular collectors
    where the closest sample may be the next one.

    Scale shape — the union + carry pattern of ``gauge_asof``, run in BOTH
    directions (`last(ignorenulls)` over (-inf, 0] carries the latest
    earlier gauge, `first(ignorenulls)` over [0, +inf) the next later
    one), then a codegen CASE picks the closer side and applies the
    tolerance — never an inequality join (|tx| x |gauges| rows before the
    filter, broadcast-nested-loop plan). Unlike gauge_asof's documented
    per-server sort, the window here partitions on (server, TIME-SLICE):
    the tolerance bound makes slicing EXACT — a tx can only match gauges
    within tol_ms, so replicating each gauge into the adjacent slice when
    it sits within tol_ms of the boundary (a ~tol/slice fraction) gives
    every tx its full candidate set inside its own slice. Parallelism is
    |servers| x |slices| and keeps growing with retention; measured 10x
    events -> near-flat (the unsliced form serializes on |servers| tasks).
    Both carry directions share one (server, slice) exchange + sort. A
    gauge at exactly the tx timestamp sorts ahead of the tx row (is_tx
    tiebreak), so it is the backward candidate at distance 0 in both
    engines.
    """
    assert int(tol_ms) < int(slice_ms), "slicing is exact only for tol < slice"
    sl = int(slice_ms)
    g0 = gauges.select(
        "server",
        (F.col("timestamp") / F.lit(sl)).cast("long").alias("slice"),
        F.col("timestamp").alias("ts"),
        F.lit(0).alias("is_tx"),
        F.lit(None).cast("string").alias("logid"),
        F.col("timestamp").alias("g_ts"),
        F.col("heapused").alias("g_heap"),
    )
    off = F.col("ts") % F.lit(sl)
    g = g0.unionAll(
        # within tol of the slice START: also a candidate for the previous
        # slice's trailing tx rows (their forward direction)
        g0.where(off < F.lit(int(tol_ms))).withColumn(
            "slice", F.col("slice") - F.lit(1)
        )
    ).unionAll(
        # within tol of the slice END: backward candidate for the next
        # slice's leading tx rows
        g0.where(F.lit(sl) - off <= F.lit(int(tol_ms))).withColumn(
            "slice", F.col("slice") + F.lit(1)
        )
    )
    t = tx.select(
        "server",
        (F.col("endts") / F.lit(sl)).cast("long").alias("slice"),
        F.col("endts").alias("ts"),
        F.lit(1).alias("is_tx"),
        "logid",
        F.lit(None).cast("long").alias("g_ts"),
        F.lit(None).cast("long").alias("g_heap"),
    )
    from pyspark.sql import Window

    wb = (
        Window.partitionBy("server", "slice")
        .orderBy("ts", "is_tx", "logid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward carry = RUNNING last() over the REVERSED sort, not first()
    # over an unbounded-FOLLOWING frame: Spark evaluates running
    # (preceding..current) frames in one streaming pass per partition,
    # while UnboundedFollowingWindowFunctionFrame re-aggregates the
    # remaining rows PER ROW — measured O(n^2): 89 s at sf0.1 on one
    # slice vs ~2 s for this form (the gauge_interpolate lesson). Tie
    # rule preserved: at equal ts the reverse sort (is_tx DESC) places
    # the gauge AFTER the tx row, so an at-ts gauge is excluded from the
    # tx's reversed running frame — it stays backward-only.
    wf = (
        Window.partitionBy("server", "slice")
        .orderBy(
            F.col("ts").desc(), F.col("is_tx").desc(), F.col("logid").desc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = g.unionAll(t)
    carried = u.select(
        "server",
        "ts",
        "is_tx",
        "logid",
        F.last("g_ts", ignorenulls=True).over(wb).alias("b_ts"),
        F.last("g_heap", ignorenulls=True).over(wb).alias("b_heap"),
        F.last("g_ts", ignorenulls=True).over(wf).alias("f_ts"),
        F.last("g_heap", ignorenulls=True).over(wf).alias("f_heap"),
    ).where(F.col("is_tx") == 1)
    d_b = F.col("ts") - F.col("b_ts")
    d_f = F.col("f_ts") - F.col("ts")
    pick_b = F.col("b_ts").isNotNull() & (
        F.col("f_ts").isNull() | (d_b <= d_f)
    )
    n_ts = F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts"))
    n_heap = F.when(pick_b, F.col("b_heap")).otherwise(F.col("f_heap"))
    n_dist = F.when(pick_b, d_b).otherwise(d_f)
    n_dir = F.when(pick_b, F.lit("b")).otherwise(F.lit("f"))
    within = n_ts.isNotNull() & (n_dist <= F.lit(int(tol_ms)))
    return carried.select(
        "logid",
        "server",
        F.col("ts").alias("endts"),
        F.when(within, n_ts).alias("gauge_ts"),
        F.when(within, n_heap).alias("heapused"),
        F.when(within, n_dist).alias("dist_ms"),
        F.when(within, n_dir).alias("direction"),
    )


def nearest_event_join_oracle_sql(tol_ms: int = NEAREST_TOL_MS) -> str:
    """Two native ASOF joins (backward >=, forward <=) + the same
    closer-side CASE. jx formulas mirror zerofill.jmx_gauges; the gate
    sparsifies to every third minute so both directions and tolerance
    nulls are exercised."""
    return f"""
, jx AS (
    SELECT (endts - endts % 60000) AS timestamp, server,
           CAST(100000000 + SUM(elapsed) * 1000 AS BIGINT) AS heapused
    FROM tx GROUP BY 1, 2
),
jx3 AS (SELECT * FROM jx WHERE timestamp % 180000 = 0),
bwd AS (
    SELECT t.logid, t.server, t.endts,
           g.timestamp AS b_ts, g.heapused AS b_heap
    FROM tx t ASOF LEFT JOIN jx3 g
      ON t.server = g.server AND t.endts >= g.timestamp
),
fwd AS (
    SELECT t.logid, t.server, t.endts,
           g.timestamp AS f_ts, g.heapused AS f_heap
    FROM tx t ASOF LEFT JOIN jx3 g
      ON t.server = g.server AND t.endts <= g.timestamp
),
joined AS (
    SELECT b.logid, b.server, b.endts, b.b_ts, b.b_heap, f.f_ts, f.f_heap,
           (b.b_ts IS NOT NULL AND
            (f.f_ts IS NULL OR (b.endts - b.b_ts) <= (f.f_ts - b.endts)))
               AS pick_b
    FROM bwd b JOIN fwd f ON b.logid = f.logid AND b.server = f.server
),
picked AS (
    SELECT logid, server, endts,
           CASE WHEN pick_b THEN b_ts ELSE f_ts END AS n_ts,
           CASE WHEN pick_b THEN b_heap ELSE f_heap END AS n_heap,
           CASE WHEN pick_b THEN endts - b_ts ELSE f_ts - endts END AS n_dist,
           CASE WHEN pick_b THEN 'b' ELSE 'f' END AS n_dir
    FROM joined
)
SELECT logid, server, endts,
       CASE WHEN n_ts IS NOT NULL AND n_dist <= {int(tol_ms)} THEN n_ts END
           AS gauge_ts,
       CASE WHEN n_ts IS NOT NULL AND n_dist <= {int(tol_ms)} THEN n_heap END
           AS heapused,
       CASE WHEN n_ts IS NOT NULL AND n_dist <= {int(tol_ms)} THEN n_dist END
           AS dist_ms,
       CASE WHEN n_ts IS NOT NULL AND n_dist <= {int(tol_ms)} THEN n_dir END
           AS direction
FROM picked
"""


# ---------------------------------------------------------------------------
# Sliced as-of join (the gauge_asof docstring's "one-gauge carry into each
# slice" flip, implemented and graded)
# ---------------------------------------------------------------------------

ASOF_SLICE_MS = 21_600_000  # 6 h


def gauge_asof_sliced(
    tx: DataFrame, gauges: DataFrame, slice_ms: int = ASOF_SLICE_MS
) -> DataFrame:
    """``gauge_asof`` semantics (latest gauge at-or-before, same columns,
    same tie rule) with the window partitioned on (server, TIME-SLICE)
    instead of server alone — the documented 100 TB mitigation for the
    per-server history sort, made real and hash-graded against the SAME
    oracle as ``gauge_asof``.

    Backward-only lookback is unbounded, so unlike ``nearest_event_join``
    a tolerance replication can't seed the slices. Instead, a CARRY-IN
    pass does: (1) per (server, slice) keep the latest gauge (one
    max_by-shaped rollup, map-side combinable); (2) for every slice a tx
    occupies, pick the latest summary from any STRICTLY EARLIER slice —
    a per-server ordered window over |slices| summary rows, trivially
    small; (3) inject that one gauge row into the slice (original ts, so
    it sorts first) and run the usual union + last(ignorenulls) window
    inside (server, slice). Every tx then sees all same-slice gauges
    before it plus the only earlier gauge that can win. Exact for any
    gauge spacing, including slices with no gauges at all (the carry
    window runs over the summary+marker union, so carries cross empty
    slices). Parallelism |servers| x |slices| like the nearest join.
    """
    sl = int(slice_ms)
    g_sl = (F.col("timestamp") / F.lit(sl)).cast("long")
    t_sl = (F.col("endts") / F.lit(sl)).cast("long")
    # (1) latest gauge per (server, slice) — max_by via struct max (ts is
    # the leading struct field, unique per (server, minute))
    summary = (
        gauges.select(
            "server",
            g_sl.alias("slice"),
            F.struct(
                F.col("timestamp").alias("ts"),
                F.col("heapused").alias("heapused"),
                F.col("threadcnt").alias("threadcnt"),
            ).alias("g"),
        )
        .groupBy("server", "slice")
        .agg(F.max("g").alias("g"))
    )
    # (2) carry-in per tx-occupied slice: latest summary from a STRICTLY
    # EARLIER slice. Union summary rows (kind 0) with tx slice markers
    # (kind 1); a per-server RANGE frame over `slice` with upper bound -1
    # excludes every same-slice row by construction, so the carry is
    # always the newest earlier-slice summary — and it is ALWAYS injected.
    # (A rows-frame + "drop when the same slice has a gauge" filter is
    # wrong: a tx that precedes its slice's first gauge would lose the
    # carry and resolve to NULL instead of the previous slice's gauge.)
    # Injecting alongside same-slice gauges is harmless: the in-slice
    # backward window picks the latest at-or-before, and the carry's ts
    # is strictly below every same-slice ts.
    markers = (
        tx.select("server", t_sl.alias("slice"))
        .distinct()
        .select("server", "slice", F.lit(1).alias("kind"),
                F.lit(None).cast(
                    "struct<ts:long,heapused:long,threadcnt:int>"
                ).alias("g"))
    )
    summ = summary.select("server", "slice", F.lit(0).alias("kind"), "g")
    from pyspark.sql import Window

    wc = (
        Window.partitionBy("server")
        .orderBy("slice")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    carried = (
        summ.unionAll(markers)
        .select(
            "server",
            "slice",
            "kind",
            F.last("g", ignorenulls=True).over(wc).alias("cg"),
        )
        .where((F.col("kind") == 1) & F.col("cg").isNotNull())
        .select(
            "server",
            "slice",
            F.col("cg.ts").alias("ts"),
            F.col("cg.heapused").alias("heapused"),
            F.col("cg.threadcnt").alias("threadcnt"),
        )
    )
    # (3) in-slice union + backward carry window (gauge_asof's comparator)
    def g_rows(df):
        return df.select(
            "server",
            (F.col("ts") / F.lit(sl)).cast("long").alias("slice")
            if "slice" not in df.columns
            else F.col("slice"),
            F.col("ts"),
            F.lit(0).alias("is_tx"),
            F.lit(None).cast("string").alias("logid"),
            F.lit(None).cast("long").alias("elapsed"),
            F.col("ts").alias("gauge_ts"),
            "heapused",
            "threadcnt",
        )

    g_in = g_rows(
        gauges.select(
            "server", g_sl.alias("slice"), F.col("timestamp").alias("ts"),
            "heapused", "threadcnt",
        )
    )
    g_carry = g_rows(carried)
    t_in = tx.select(
        "server",
        t_sl.alias("slice"),
        F.col("endts").alias("ts"),
        F.lit(1).alias("is_tx"),
        "logid",
        "elapsed",
        F.lit(None).cast("long").alias("gauge_ts"),
        F.lit(None).cast("long").alias("heapused"),
        F.lit(None).cast("int").alias("threadcnt"),
    )
    w = (
        Window.partitionBy("server", "slice")
        .orderBy("ts", "is_tx", "logid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = g_in.unionAll(g_carry).unionAll(t_in)
    out = u.select(
        "server",
        "ts",
        "is_tx",
        "logid",
        "elapsed",
        F.last("gauge_ts", ignorenulls=True).over(w).alias("gauge_ts"),
        F.last("heapused", ignorenulls=True).over(w).alias("heapused"),
        F.last("threadcnt", ignorenulls=True).over(w).alias("threadcnt"),
    )
    return out.where(F.col("is_tx") == 1).select(
        "logid",
        "server",
        F.col("ts").alias("endts"),
        "elapsed",
        "gauge_ts",
        "heapused",
        "threadcnt",
    )
