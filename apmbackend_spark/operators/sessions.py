"""Gap-based sessionization and hierarchical rollup over the tx stream.

SURVEY.md §2.9 lists session windows and grouping-sets/rollup among the
categories the reference does NOT implement ("audit-trail sessions are
parse-level, not time-gap based"); both come essentially free from Spark and
round out the engine's aggregation surface for training-data pipelines
(user-session reconstruction, per-source traffic summaries).

Scale shape:
  * `sessionize` — Spark's native `session_window` groupBy: one shuffle on
    (key-hash), map-side partial merge of session fragments, no per-key
    global sort. The same expression works under Structured Streaming with
    a watermark (session state is evicted once the gap closes), so the
    batch and streaming renderings share one plan.
  * `service_rollup` — a single `rollup` aggregation: Spark expands the
    grouping sets and still map-side-combines; no extra scan per level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MINUTES = 5.0


def sessionize(tx: DataFrame, gap_minutes: float = DEFAULT_GAP_MINUTES) -> DataFrame:
    """Per (server, service) gap-based sessions: consecutive tx closer than
    `gap_minutes` apart fuse into one session; the session closes `gap`
    after its last event (Spark session_window semantics: end = last event
    time + gap, end-exclusive).

    Bounds are emitted as epoch-ms BIGINTs computed from the ms-floored
    event time, so the DuckDB island-detection oracle (lag + cumulative
    boundary count) is bit-identical.
    """
    gap_ms = int(round(gap_minutes * 60_000))
    evt = tx.select(
        "server",
        "service",
        F.timestamp_millis(F.col("endts")).alias("et"),
        "elapsed",
    )
    return (
        evt.groupBy(
            F.session_window("et", f"{gap_ms} milliseconds"),
            "server",
            "service",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("elapsed").alias("sum_elapsed"),
        )
        .select(
            "server",
            "service",
            F.unix_millis(F.col("session_window.start")).alias("session_start"),
            F.unix_millis(F.col("session_window.end")).alias("session_end"),
            "n_events",
            "sum_elapsed",
        )
    )


def sessionize_oracle_ctes(
    gap_minutes: float = DEFAULT_GAP_MINUTES, out: str = "sessions"
) -> str:
    """Island detection as a reusable CTE chain ending in ``{out}``: a
    session boundary is a gap >= gap_ms from the previous event of the same
    key; session id = running boundary count. Tie-safe: equal endts rows
    always fuse (diff 0 < gap) whatever the tie order, so group membership
    is deterministic."""
    gap_ms = int(round(gap_minutes * 60_000))
    return f"""
, ev AS (
    SELECT server, service, endts, elapsed FROM tx
), flagged AS (
    SELECT server, service, endts, elapsed,
           CASE WHEN lag(endts) OVER w IS NULL
                     OR endts - lag(endts) OVER w >= {gap_ms}
                THEN 1 ELSE 0 END AS is_new
    FROM ev
    WINDOW w AS (PARTITION BY server, service ORDER BY endts)
), sess AS (
    SELECT server, service, endts, elapsed,
           SUM(is_new) OVER (PARTITION BY server, service ORDER BY endts
                             ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
), {out} AS (
    SELECT server, service,
           MIN(endts) AS session_start,
           MAX(endts) + {gap_ms} AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(elapsed) AS BIGINT) AS sum_elapsed
    FROM sess
    GROUP BY server, service, sid
)"""


def sessionize_oracle_sql(gap_minutes: float = DEFAULT_GAP_MINUTES) -> str:
    return sessionize_oracle_ctes(gap_minutes) + "\nSELECT * FROM sessions"


ALL_LABEL = "<all>"


def service_rollup(tx: DataFrame) -> DataFrame:
    """Traffic/latency summary at three grain levels in one aggregation:
    (server, service), (server), and grand total, via `rollup`. NULL group
    labels are rewritten to '<all>' (keys never collide: real servers are
    'srvN'). avg_ms is computed as exact-integer-sum / count, so the double
    division is order-independent and engine-identical."""
    rolled = tx.rollup("server", "service").agg(
        F.count(F.lit(1)).alias("n_tx"),
        F.sum("elapsed").alias("total_ms"),
    )
    return rolled.select(
        F.coalesce(F.col("server"), F.lit(ALL_LABEL)).alias("server"),
        F.coalesce(F.col("service"), F.lit(ALL_LABEL)).alias("service"),
        "n_tx",
        "total_ms",
        (F.col("total_ms").cast("double") / F.col("n_tx")).alias("avg_ms"),
    )


SERVICE_ROLLUP_ORACLE = f"""
SELECT COALESCE(server, '{ALL_LABEL}') AS server,
       COALESCE(service, '{ALL_LABEL}') AS service,
       CAST(COUNT(*) AS BIGINT) AS n_tx,
       CAST(SUM(elapsed) AS BIGINT) AS total_ms,
       CAST(SUM(elapsed) AS DOUBLE) / COUNT(*) AS avg_ms
FROM tx
GROUP BY ROLLUP(server, service)
"""


def service_cube(tx: DataFrame) -> DataFrame:
    """All four grain levels in one aggregation — (server, service),
    (server), (service), and grand total — via `cube`: the service-only
    grain is the one `rollup` cannot produce (cross-host per-service
    traffic, the view an SRE pivots to first). Same single map-side
    combinable shuffle; Spark expands the grouping sets without extra
    scans."""
    cubed = tx.cube("server", "service").agg(
        F.count(F.lit(1)).alias("n_tx"),
        F.sum("elapsed").alias("total_ms"),
    )
    return cubed.select(
        F.coalesce(F.col("server"), F.lit(ALL_LABEL)).alias("server"),
        F.coalesce(F.col("service"), F.lit(ALL_LABEL)).alias("service"),
        "n_tx",
        "total_ms",
        (F.col("total_ms").cast("double") / F.col("n_tx")).alias("avg_ms"),
    )


SERVICE_CUBE_ORACLE = f"""
SELECT COALESCE(server, '{ALL_LABEL}') AS server,
       COALESCE(service, '{ALL_LABEL}') AS service,
       CAST(COUNT(*) AS BIGINT) AS n_tx,
       CAST(SUM(elapsed) AS BIGINT) AS total_ms,
       CAST(SUM(elapsed) AS DOUBLE) / COUNT(*) AS avg_ms
FROM tx
GROUP BY CUBE(server, service)
"""


def apdex(
    tx: DataFrame, satisfied_ms: int = 500, tolerating_ms: int = 2000
) -> DataFrame:
    """Apdex / SLA-attainment rollup per (server, service): the industry
    score the reference's percentile stats feed into on the dashboard side
    (satisfied <= T, tolerating <= 4T convention, here explicit bounds):

        apdex = (n_satisfied + n_tolerating/2) / n

    Integer bucket counts (exact, map-side combinable partial aggregation
    in ONE shuffle) and a single final double division — the same
    bit-determinism discipline as window_stats. Scale: a plain
    two-phase hash aggregate; cardinality = live (server, service) pairs."""
    sat = (F.col("elapsed") <= int(satisfied_ms)).cast("long")
    tol = (
        (F.col("elapsed") > int(satisfied_ms))
        & (F.col("elapsed") <= int(tolerating_ms))
    ).cast("long")
    return (
        tx.groupBy("server", "service")
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.sum(sat).alias("n_satisfied"),
            F.sum(tol).alias("n_tolerating"),
        )
        .select(
            "server",
            "service",
            "n_tx",
            "n_satisfied",
            "n_tolerating",
            (
                (
                    F.col("n_satisfied").cast("double")
                    + F.col("n_tolerating").cast("double") / 2.0
                )
                / F.col("n_tx").cast("double")
            ).alias("apdex"),
        )
    )


def apdex_oracle_sql(satisfied_ms: int = 500, tolerating_ms: int = 2000) -> str:
    return f"""
SELECT server, service,
       CAST(COUNT(*) AS BIGINT) AS n_tx,
       CAST(SUM(CASE WHEN elapsed <= {satisfied_ms} THEN 1 ELSE 0 END) AS BIGINT) AS n_satisfied,
       CAST(SUM(CASE WHEN elapsed > {satisfied_ms} AND elapsed <= {tolerating_ms} THEN 1 ELSE 0 END) AS BIGINT) AS n_tolerating,
       ((CAST(SUM(CASE WHEN elapsed <= {satisfied_ms} THEN 1 ELSE 0 END) AS DOUBLE)
         + CAST(SUM(CASE WHEN elapsed > {satisfied_ms} AND elapsed <= {tolerating_ms} THEN 1 ELSE 0 END) AS DOUBLE) / 2.0)
        / COUNT(*)) AS apdex
FROM tx GROUP BY server, service
"""


# ---------------------------------------------------------------------------
# Per-user event-type transition mining (Markov bigrams).
# ---------------------------------------------------------------------------

TRANSITIONS_TOP_K = 3


def event_transitions(events: DataFrame, top_k: int = TRANSITIONS_TOP_K) -> DataFrame:
    """Top-k next-event transitions per antecedent event type — the
    first-order Markov matrix product analytics builds funnels from, and
    the sequence-level complement of the per-doc n-gram operators in
    ``textstats.py`` (same rollup, but over user event streams).

    Semantics: order each user's events by (ts, event_id) — event_id is
    globally unique, so the order (and therefore every count) is total and
    deterministic; pair each event with its successor via ``lead``; count
    (prev_type, next_type) pairs; keep each antecedent's top-k successors
    ranked by count descending — rank over the count ALONE (no tiebreak
    column, not row_number), so equal-count ties share a rank and ALL
    surface; the result set is still deterministic because rank depends
    only on the counts, never on row order.

    Physical shape: one shuffle on user_id for the lead window (pinned
    ``repartition(n, user_id)`` — AQE's byte-based coalescing must not
    collapse the window exchange), sortWithinPartitions only (no global
    sort), then a map-side-combinable pair count whose output frame is
    |event_type|^2 rows — the final per-antecedent rank window runs on
    that tiny frame. At 100 TB the only full-data shuffle is the user_id
    exchange, and a table already bucketed by user (the natural layout
    for behavioral data) eliminates even that.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.repartition(32, "user_id")
        .select(
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    rw = Window.partitionBy("prev_type").orderBy(F.col("n").desc())
    return (
        counts.repartition(32, "prev_type")
        .withColumn("rnk", F.rank().over(rw))
        .where(F.col("rnk") <= top_k)
    )


def event_transitions_oracle_sql(top_k: int = TRANSITIONS_TOP_K) -> str:
    return f"""
WITH pairs AS (
    SELECT event_type AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
),
counts AS (
    SELECT prev_type, next_type, COUNT(*) AS n
    FROM pairs WHERE next_type IS NOT NULL
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(RANK() OVER (PARTITION BY prev_type
                         ORDER BY n DESC) AS INTEGER) AS rnk
FROM counts
QUALIFY rnk <= {top_k}
"""


# ---------------------------------------------------------------------------
# Ordered funnel conversion (sequential-pattern matching per user).
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_steps(events: DataFrame, steps=FUNNEL_STEPS) -> DataFrame:
    """Per-user funnel conversion: how far each user advanced through an
    ORDERED step sequence (each step must occur strictly after the match
    of the previous one), with the timestamp of each completed step.

    This is the sequential-dependency query a naive SQL translation gets
    wrong (three MIN(CASE...) aggregates ignore ordering) and the one
    behind every conversion dashboard. Semantics: sort each user's events
    by (ts, event_id) — a total, deterministic order — and fold left,
    advancing a stage pointer on the first event matching the next step.

    Physical shape: ONE shuffle (groupBy user_id with a partial-merged
    collect_list); the fold itself is a codegen higher-order ``aggregate``
    over the in-row array — no Python, no second pass, no join per step
    (a step-per-join plan would shuffle k times). The per-user event list
    must fit in one aggregation buffer — the same bound as any per-entity
    sequence operator; for unbounded histories the documented flip is the
    sessionized fold via ``applyInPandasWithState`` (streaming/stateful.py
    pattern), identical per-step semantics.

    Output: user_id, stage reached (0..len(steps)), and t1..tk epoch-
    microsecond timestamps of each completed step (NULL past the stage).
    """
    from functools import reduce as _reduce  # noqa: F401

    k = len(steps)
    elems = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col("ts")).alias("ts_us"),
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("ty"),
            )
        )
    )
    init = F.struct(
        F.lit(0).cast("int").alias("stage"),
        *[F.lit(None).cast("long").alias(f"t{i+1}") for i in range(k)],
    )

    def merge(acc, x):
        w = None
        for i, s in enumerate(steps):
            cond = (acc["stage"] == i) & (x["ty"] == F.lit(s))
            new = F.struct(
                F.lit(i + 1).cast("int").alias("stage"),
                *[
                    (x["ts_us"] if j == i else acc[f"t{j+1}"]).alias(
                        f"t{j+1}"
                    )
                    for j in range(k)
                ],
            )
            w = F.when(cond, new) if w is None else w.when(cond, new)
        return w.otherwise(acc)

    folded = (
        events.groupBy("user_id")
        .agg(elems.alias("xs"))
        .select("user_id", F.aggregate(F.col("xs"), init, merge).alias("f"))
    )
    return folded.select(
        "user_id",
        F.col("f.stage").alias("stage"),
        *[F.col(f"f.t{i+1}").alias(f"t{i+1}") for i in range(k)],
    )


def funnel_steps_oracle_sql(steps=FUNNEL_STEPS) -> str:
    k = len(steps)
    tfields = ", ".join(
        f"t{i+1} := CAST(NULL AS BIGINT)" for i in range(k)
    )
    elem = (
        "struct_pack(stage := CAST(NULL AS INTEGER), "
        + tfields
        + ", ts_us := epoch_us(ts), ty := event_type)"
    )
    init = (
        "struct_pack(stage := 0, "
        + tfields
        + ", ts_us := CAST(NULL AS BIGINT), ty := CAST(NULL AS VARCHAR))"
    )
    branches = []
    for i, s in enumerate(steps):
        sets = ", ".join(
            f"t{j+1} := " + ("x.ts_us" if j == i else f"acc.t{j+1}")
            for j in range(k)
        )
        branches.append(
            f"WHEN acc.stage = {i} AND x.ty = '{s}' THEN "
            f"struct_pack(stage := {i+1}, {sets}, "
            "ts_us := CAST(NULL AS BIGINT), ty := CAST(NULL AS VARCHAR))"
        )
    case = "CASE " + " ".join(branches) + " ELSE acc END"
    touts = ", ".join(f"f.t{i+1} AS t{i+1}" for i in range(k))
    return f"""
WITH seq AS (
    SELECT user_id, list({elem} ORDER BY ts, event_id) AS xs
    FROM events GROUP BY user_id
), folded AS (
    SELECT user_id,
           list_reduce(list_prepend({init}, xs), (acc, x) -> {case}) AS f
    FROM seq
)
SELECT user_id, f.stage AS stage, {touts} FROM folded
"""


# ---------------------------------------------------------------------------
# Exponentially time-decayed engagement counters (feature-store shape).
# ---------------------------------------------------------------------------

# Scoring instant: fixed one tick past the fixture month (a literal, not
# max(ts) — a data-derived as-of would need a driver-side scalar or a
# global aggregate broadcast; a serving pipeline scores at a KNOWN time).
DECAY_ASOF = "2024-01-31 00:00:00"
DECAY_ASOF_US = 1_706_659_200_000_000  # epoch micros of the above, UTC
# Dyadic-exact decay: half-life = 1 day on whole-day ages, so every weight
# is 2^-age — an exact power of two. Weights are folded as the SCALED
# integer 2^(DECAY_SCALE - age) and divided back once at the end: integer
# sums are order-free, so the result is bit-identical across engines with
# no float-summation contract (the engine-wide cents discipline, applied
# to exponential decay).
DECAY_SCALE = 40  # ages beyond this floor at weight 2^-DECAY_SCALE (~9e-13)


def decayed_counts(events: DataFrame) -> DataFrame:
    """Per (user_id, event_type): n_events, last-seen epoch-ms, and the
    exponentially decayed event count at DECAY_ASOF (half-life 1 day).

    decayed = Σ 2^-min(age_days, DECAY_SCALE)   [age floored to whole days]

    Plan: ONE map-side-combinable groupBy — count, max, and an integer sum
    — over a single scan; this is the classic feature-store aggregation
    (recency-weighted engagement) and stays a single partial-agg shuffle
    at any scale. The scaled sum is a BIGINT: worst case every event at
    age 0 needs n * 2^40, i.e. ~8M rows per (user, type) before overflow;
    the documented 100 TB flip is summing as DECIMAL(38,0) (same plan).
    """
    w = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"{DECAY_SCALE} - CAST(LEAST(CAST(({DECAY_ASOF_US} - unix_micros(ts))"
        f" div 86400000000 AS INT), {DECAY_SCALE}) AS INT))"
    )
    return (
        events.where(F.col("ts") <= F.to_timestamp(F.lit(DECAY_ASOF)))
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_millis(F.max("ts")).alias("last_seen_ms"),
            F.sum(w).alias("sw"),
        )
        .select(
            "user_id",
            "event_type",
            "n_events",
            "last_seen_ms",
            (
                F.col("sw").cast("double")
                / F.lit(float(1 << DECAY_SCALE))
            ).alias("decayed"),
        )
    )


def decayed_counts_oracle_sql() -> str:
    age = f"(({DECAY_ASOF_US} - epoch_us(ts)) // 86400000000)"
    return f"""
WITH w AS (
    SELECT user_id, event_type, ts,
           CAST(1 AS BIGINT) << CAST(
               {DECAY_SCALE} - LEAST({age}, {DECAY_SCALE}) AS INT) AS wt
    FROM events
    WHERE ts <= TIMESTAMP '{DECAY_ASOF}'
)
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       epoch_ms(MAX(ts)) AS last_seen_ms,
       CAST(SUM(wt) AS DOUBLE) / {float(1 << DECAY_SCALE)!r} AS decayed
FROM w
GROUP BY user_id, event_type
"""


# ---------------------------------------------------------------------------
# Cohort retention analysis.
# ---------------------------------------------------------------------------

def retention_cohorts(events: DataFrame) -> DataFrame:
    """Classic cohort retention: users grouped by first-seen day (their
    cohort), then per (cohort_day, day-offset) distinct-active-user counts
    and the retention rate against the cohort's size.

    Plan shape: two distinct-aggregates and one equi-join, ALL partitioned
    on user_id — the (user, day) activity grid and the per-user first-day
    frame co-partition, so the join adds no third shuffle; the final
    (cohort_day, offset) rollup is map-side combinable and bounded by
    days², not users. Exact integer counts + one final division: bitwise
    deterministic.
    """
    active = (
        events.select(
            "user_id", F.to_date("ts").alias("day")
        ).distinct()
    )
    first = active.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    grid = (
        active.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )
    return (
        grid.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            (
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
            ).alias("retention"),
        )
    )


def retention_cohorts_oracle_sql() -> str:
    return """
WITH active AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), first AS (
    SELECT user_id, MIN(day) AS cohort_day FROM active GROUP BY user_id
), sizes AS (
    SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
    FROM first GROUP BY cohort_day
), grid AS (
    SELECT f.cohort_day,
           CAST(a.day - f.cohort_day AS INT) AS offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM active a JOIN first f USING (user_id)
    GROUP BY 1, 2
)
SELECT g.cohort_day, g.offset, g.n_active, s.cohort_size,
       CAST(g.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
           AS retention
FROM grid g JOIN sizes s USING (cohort_day)
"""


# ---------------------------------------------------------------------------
# Last-touch attribution.
# ---------------------------------------------------------------------------

ATTR_CONVERSION = "purchase"
ATTR_TOUCH_TYPES = ("click", "view")


def session_attribution(events: DataFrame) -> DataFrame:
    """Last-touch attribution: each conversion event is credited to the
    most recent PRECEDING touch event (click/view) of the same user —
    the standard marketing-attribution join, expressed as one carry-
    forward window instead of an as-of join.

    Plan shape: ONE shuffle (user_id), one ordered window with
    `last(_, ignorenulls)` over rows(-inf, -1) — no self-join, no range
    join. The (ts, event_id) total order makes ties deterministic.
    Output timestamps are epoch-ms BIGINTs (engine-portable hashing).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin(*ATTR_TOUCH_TYPES),
        F.struct(
            F.col("ts").alias("ts"),
            F.col("event_id").alias("event_id"),
            F.col("event_type").alias("event_type"),
        ),
    )
    enriched = events.withColumn(
        "last_touch", F.last(touch, ignorenulls=True).over(w)
    )
    conv = enriched.where(F.col("event_type") == ATTR_CONVERSION)
    lt = F.col("last_touch")
    return conv.select(
        "user_id",
        F.col("event_id").alias("conversion_id"),
        F.unix_millis("ts").alias("conversion_ms"),
        lt["event_id"].alias("touch_id"),
        lt["event_type"].alias("touch_type"),
        F.unix_millis(lt["ts"]).alias("touch_ms"),
        (F.unix_millis("ts") - F.unix_millis(lt["ts"])).alias("gap_ms"),
    )


def session_attribution_oracle_sql() -> str:
    touches = ", ".join(f"'{t}'" for t in ATTR_TOUCH_TYPES)
    return f"""
WITH enriched AS (
    SELECT user_id, event_id, event_type, ts,
           last_value(
               CASE WHEN event_type IN ({touches})
                    THEN struct_pack(ts := ts, event_id := event_id,
                                     event_type := event_type) END
               IGNORE NULLS
           ) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS last_touch
    FROM events
)
SELECT user_id,
       event_id AS conversion_id,
       epoch_ms(ts) AS conversion_ms,
       last_touch.event_id AS touch_id,
       last_touch.event_type AS touch_type,
       epoch_ms(last_touch.ts) AS touch_ms,
       epoch_ms(ts) - epoch_ms(last_touch.ts) AS gap_ms
FROM enriched
WHERE event_type = '{ATTR_CONVERSION}'
"""
