"""Seasonal baseline anomaly scoring + robust trend estimation.

The reference's z-score cascade (``z_score.js``, ``util_methods.js:30-60``)
models "normal" as the trailing ``lag`` intervals — blind to *time-of-day*
structure: a 9 AM traffic surge that happens every day re-alarms every
morning. The standard APM fix is a seasonal baseline: learn per
(series, hour-of-day) statistics from a training span, then score later
intervals against the hour's own history. ``seasonal_baseline`` is that
operator, built with the engine's established determinism discipline:

* per-row values are quantized to integer cents (``floor(v*100 + 0.5)``,
  the fixed-point rule shared with ``winsorize``/``topology_wire``), so
  every aggregate is an order-free exact integer sum — no float-summation
  ordering contract is needed between engines;
* mean/variance come from the (n, Σc, Σc²) sufficient statistics; the
  final mean/σ/z are a short fixed sequence of IEEE double ops (casts,
  one subtraction per term, one division, one sqrt) written identically
  in the Spark plan and the DuckDB oracle — bit-identical by construction;
* a zero-variance baseline yields z = NULL, the engine-wide rendering of
  the reference's "constant series never signal" quirk
  (``util_methods.js:44-48``).

Plan shape: ONE scan of events feeds both halves (the split is a pure
filter), each half is a map-side-combinable groupBy on low-cardinality
keys, and the baseline frame — bounded at |series| × 24 rows *regardless
of data volume* — broadcast-joins onto the scored intervals. No sort, no
window, no Python. At 100 TB the only full-data stage is the first
partial aggregate.

``trend_slopes`` is the second robust complement: Theil–Sen (median of
pairwise slopes) over the per-hour interval counts, the estimator of
drift that a single outlier interval cannot drag (its breakdown point is
~29 %, vs 0 % for OLS). The all-pairs stage is O(H²) in the number of
*hour buckets* — bounded by the time span, independent of event volume —
so the quadratic piece never touches raw data. Medians reuse the graded
midpoint-percentile rule (``functions/percentile.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apmbackend_spark.functions.percentile import (
    midpoint_percentile,
    midpoint_percentile_sql,
)

# Train on the first three weeks of the fixture month, score the rest.
BASELINE_LAST_DAY = 21
# |z| above this flags the interval (classic 3-sigma rule).
Z_FLAG = 3.0

_CENTS = "CAST(floor(value * 100.0 + 0.5) AS BIGINT)"


def _cents(col: str = "value") -> F.Column:
    return F.floor(F.col(col) * F.lit(100.0) + F.lit(0.5)).cast("long")


def seasonal_baseline(events: DataFrame) -> DataFrame:
    """Hour-of-day baseline scoring: per (event_type, day, hour) interval
    in the scoring span, the z of its mean value against the same
    (event_type, hour) baseline learned from days 1..BASELINE_LAST_DAY.

    Output: event_type, day, hour, n_obs, mean_cents, base_n, base_mean,
    base_sd, z (NULL when the baseline is absent or has zero variance),
    anomalous.
    """
    ev = events.where(F.col("value").isNotNull()).select(
        "event_type",
        F.dayofmonth("ts").alias("day"),
        F.hour("ts").alias("hour"),
        _cents().alias("c"),
    )
    base = (
        ev.where(F.col("day") <= BASELINE_LAST_DAY)
        .groupBy("event_type", "hour")
        .agg(
            F.count("*").alias("base_n"),
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
    )
    # All-double sufficient-statistic algebra (cast BEFORE multiplying so
    # the Σc·Σc product can never hit int64 overflow at scale); clamp the
    # catastrophic-cancellation residue at 0 so sqrt never sees -1e-10.
    nd = F.col("base_n").cast("double")
    sd_ = F.col("s").cast("double")
    s2d = F.col("s2").cast("double")
    var = F.greatest(nd * s2d - sd_ * sd_, F.lit(0.0)) / (nd * nd)
    base = base.select(
        "event_type",
        "hour",
        "base_n",
        (sd_ / nd).alias("base_mean"),
        F.sqrt(var).alias("base_sd"),
    )
    score = (
        ev.where(F.col("day") > BASELINE_LAST_DAY)
        .groupBy("event_type", "day", "hour")
        .agg(F.count("*").alias("n_obs"), F.sum("c").alias("sc"))
        .select(
            "event_type",
            "day",
            "hour",
            "n_obs",
            (F.col("sc").cast("double") / F.col("n_obs").cast("double")).alias(
                "mean_cents"
            ),
        )
    )
    j = score.join(F.broadcast(base), ["event_type", "hour"], "left")
    z = F.when(
        F.col("base_sd") > F.lit(0.0),
        (F.col("mean_cents") - F.col("base_mean")) / F.col("base_sd"),
    )  # missing or zero-variance baseline -> NULL (never signals)
    return j.select(
        "event_type",
        "day",
        "hour",
        "n_obs",
        "mean_cents",
        "base_n",
        "base_mean",
        "base_sd",
        z.alias("z"),
        (z.isNotNull() & (F.abs(z) > F.lit(Z_FLAG))).alias("anomalous"),
    )


def seasonal_baseline_oracle_sql() -> str:
    return f"""
WITH ev AS (
    SELECT event_type,
           EXTRACT(day FROM ts) AS day,
           EXTRACT(hour FROM ts) AS hour,
           {_CENTS} AS c
    FROM events WHERE value IS NOT NULL
), base AS (
    SELECT event_type, hour,
           COUNT(*) AS base_n,
           CAST(SUM(c) AS DOUBLE) AS s,
           CAST(SUM(c * c) AS DOUBLE) AS s2
    FROM ev WHERE day <= {BASELINE_LAST_DAY}
    GROUP BY 1, 2
), basest AS (
    SELECT event_type, hour, base_n,
           s / CAST(base_n AS DOUBLE) AS base_mean,
           sqrt(GREATEST(CAST(base_n AS DOUBLE) * s2 - s * s, 0.0)
                / (CAST(base_n AS DOUBLE) * CAST(base_n AS DOUBLE)))
               AS base_sd
    FROM base
), score AS (
    SELECT event_type, day, hour,
           COUNT(*) AS n_obs,
           CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_cents
    FROM ev WHERE day > {BASELINE_LAST_DAY}
    GROUP BY 1, 2, 3
)
SELECT s.event_type,
       CAST(s.day AS INT) AS day,
       CAST(s.hour AS INT) AS hour,
       s.n_obs,
       s.mean_cents,
       b.base_n,
       b.base_mean,
       b.base_sd,
       CASE WHEN b.base_sd > 0.0
            THEN (s.mean_cents - b.base_mean) / b.base_sd END AS z,
       CASE WHEN b.base_sd > 0.0
            THEN abs((s.mean_cents - b.base_mean) / b.base_sd) > {Z_FLAG!r}
            ELSE FALSE END AS anomalous
FROM score s LEFT JOIN basest b USING (event_type, hour)
"""


# ---------------------------------------------------------------------------
# Theil–Sen robust trend over the hourly interval series.
# ---------------------------------------------------------------------------

# Fixed epoch-hour anchor (2024-01-01 00:00 UTC) so the intercept has a
# defined origin and the slope arithmetic stays in small integers.
ANCHOR_HOUR = 1_704_067_200 // 3600


def trend_slopes(events: DataFrame) -> DataFrame:
    """Per event_type: Theil–Sen trend of the hourly event-count series.

    slope = median over all hour pairs (h1 < h2) of (c2-c1)/(h2-h1)
    [events/hour²]; intercept = median of (c_i - slope * h_i) at the
    ANCHOR_HOUR origin (Siegel-style residual median).

    Plan: raw rows reduce to the bounded (event_type, hour) grid first
    (ONE map-side-combinable shuffle); the O(H²) pair stage and both
    medians run on the grid only. The grid seam is localCheckpoint-pinned
    so the self-join's two consumers share one computed aggregate instead
    of re-scanning events twice (the doc_span_dup lesson).
    """
    hourly = (
        events.groupBy(
            "event_type",
            # integer DIV, not `/`: double division of epoch micros rounds
            # at the 2^53 boundary and can truncate to the wrong hour
            F.expr("unix_micros(ts) div 3600000000").alias("hr"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(
            "event_type",
            (F.col("hr") - F.lit(ANCHOR_HOUR)).alias("h"),
            "cnt",
        )
        .localCheckpoint(eager=True)
    )
    a = hourly.select(
        F.col("event_type").alias("et"),
        F.col("h").alias("h1"),
        F.col("cnt").alias("c1"),
    )
    b = hourly.select(
        F.col("event_type").alias("et"),
        F.col("h").alias("h2"),
        F.col("cnt").alias("c2"),
    )
    slopes = (
        a.join(b, "et")
        .where(F.col("h1") < F.col("h2"))
        .select(
            F.col("et").alias("event_type"),
            (
                (F.col("c2") - F.col("c1")).cast("double")
                / (F.col("h2") - F.col("h1")).cast("double")
            ).alias("slope"),
        )
    )
    med_slope = (
        slopes.groupBy("event_type")
        .agg(
            F.count("*").alias("n_pairs"),
            F.array_sort(F.collect_list("slope")).alias("arr"),
        )
        .select(
            "event_type",
            "n_pairs",
            midpoint_percentile(F.col("arr"), 50.0).alias("slope_per_hour"),
        )
    )
    resid = hourly.join(F.broadcast(med_slope), "event_type").select(
        "event_type",
        "n_pairs",
        "slope_per_hour",
        (
            F.col("cnt").cast("double")
            - F.col("slope_per_hour") * F.col("h").cast("double")
        ).alias("r"),
    )
    return (
        resid.groupBy("event_type", "n_pairs", "slope_per_hour")
        .agg(
            F.count("*").alias("n_points"),
            F.array_sort(F.collect_list("r")).alias("arr"),
        )
        .select(
            "event_type",
            F.col("n_points").cast("long").alias("n_points"),
            "n_pairs",
            "slope_per_hour",
            midpoint_percentile(F.col("arr"), 50.0).alias("intercept"),
        )
    )


def trend_slopes_oracle_sql() -> str:
    med = midpoint_percentile_sql("arr", 50.0)
    return f"""
WITH hourly AS (
    SELECT event_type,
           epoch_us(ts) // 3600000000 - {ANCHOR_HOUR} AS h,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2
), slopes AS (
    SELECT a.event_type,
           CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.h - a.h AS DOUBLE) AS slope
    FROM hourly a JOIN hourly b
      ON a.event_type = b.event_type AND a.h < b.h
), med AS (
    SELECT event_type, n_pairs, {med} AS slope_per_hour
    FROM (
        SELECT event_type, COUNT(*) AS n_pairs,
               list_sort(list(slope)) AS arr
        FROM slopes GROUP BY event_type
    )
), resid AS (
    SELECT h.event_type, m.n_pairs, m.slope_per_hour,
           CAST(h.cnt AS DOUBLE)
               - m.slope_per_hour * CAST(h.h AS DOUBLE) AS r
    FROM hourly h JOIN med m USING (event_type)
)
SELECT event_type, n_points, n_pairs, slope_per_hour, {med} AS intercept
FROM (
    SELECT event_type, n_pairs, slope_per_hour,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           list_sort(list(r)) AS arr
    FROM resid GROUP BY 1, 2, 3
)
"""


# ---------------------------------------------------------------------------
# Time-series profile similarity (distributed similarity search over the
# per-key hour-of-day shape — EDBT'19 "Time Series Similarity Search for
# Streaming Data in Distributed Systems" is the retrieved-paper shape:
# dimensionality-reduce each series to a fixed-length representation, then
# distance-rank against a probe).
# ---------------------------------------------------------------------------

SERIES_HOURS = 24


def series_similarity(tx: DataFrame) -> DataFrame:
    """Rank every (server, service) series by the Euclidean distance of its
    hour-of-day traffic profile from the fleet-mean profile: the "which
    series behave unlike the fleet" similarity search (rank 1 = most
    anomalous shape; invert the ordering for nearest-neighbor retrieval).

    Representation: each series is reduced to a fixed 24-dim PAA-style
    vector (events per hour-of-day over the whole span) — the classic
    dimensionality reduction that makes series comparable regardless of
    length. The probe is the fleet-mean vector.

    Bit-determinism: hour buckets and per-hour counts are pure integer
    arithmetic; the probe is (integer hour total) / (integer key count) —
    one exactly-rounded division; the squared-diff sum folds in HOUR ORDER
    via F.aggregate over sequence(0,23) (list_reduce over list(... ORDER
    BY hour) in the oracle) — never an unordered float SUM; sqrt is an
    exactly-rounded IEEE op. Same discipline as dup_pagerank/bm25_topk.

    Scale shape: ONE shuffle to (server, service, hour) partial counts
    (map-side combinable), one key-level rollup into an in-row 24-entry
    map (no zero-fill join — coalesce at fold time), per-hour totals and
    the key count broadcast as single-row dims. The final rank windows
    over |series| rows with no partition key — bounded output by
    definition of the operator; at fleet scales beyond one task's sort,
    the documented flip is a distance-threshold filter or orderBy+limit
    top-k, same semantics minus the dense rank column.
    """
    hour = F.expr("(endts % 86400000) div 3600000").cast("int")
    hourly = tx.groupBy("server", "service", hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    vecs = hourly.groupBy("server", "service").agg(
        F.map_from_entries(F.collect_list(F.struct("hour", "cnt"))).alias("m"),
        F.sum("cnt").alias("n_events"),
    )
    totals = hourly.groupBy("hour").agg(F.sum("cnt").alias("tot"))
    tot_map = totals.agg(
        F.map_from_entries(F.collect_list(F.struct("hour", "tot"))).alias("tm")
    )
    nk = vecs.agg(F.count(F.lit(1)).alias("nk"))

    def diff(h):
        mine = F.coalesce(F.element_at(F.col("m"), h), F.lit(0)).cast("double")
        fleet = F.coalesce(F.element_at(F.col("tm"), h), F.lit(0)).cast(
            "double"
        ) / F.col("nk").cast("double")
        return mine - fleet

    dist = F.sqrt(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(SERIES_HOURS - 1)),
            F.lit(0.0),
            lambda acc, h: acc + diff(h) * diff(h),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(
        F.col("dist").desc(), F.col("server").asc(), F.col("service").asc()
    )
    return (
        vecs.crossJoin(F.broadcast(tot_map))
        .crossJoin(F.broadcast(nk))
        .select("server", "service", "n_events", dist.alias("dist"))
        .withColumn("rank", F.row_number().over(w))
    )


def series_similarity_oracle_sql() -> str:
    return f"""
, hourly AS (
    SELECT server, service,
           CAST((endts % 86400000) // 3600000 AS INT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tx GROUP BY server, service, hour
),
keys AS (SELECT DISTINCT server, service FROM hourly),
grid AS (
    SELECT k.server, k.service, CAST(t.h AS INT) AS hour,
           COALESCE(hh.cnt, 0) AS cnt
    FROM keys k
    CROSS JOIN (SELECT unnest(range(0, {SERIES_HOURS})) AS h) t
    LEFT JOIN hourly hh
      ON hh.server = k.server AND hh.service = k.service AND hh.hour = t.h
),
tot AS (
    SELECT hour, CAST(SUM(cnt) AS BIGINT) AS tot FROM grid GROUP BY hour
),
nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS nk FROM keys),
diffs AS (
    SELECT g.server, g.service, g.hour, g.cnt,
           (CAST(g.cnt AS DOUBLE) - CAST(t.tot AS DOUBLE) / CAST(n.nk AS DOUBLE))
               AS d
    FROM grid g JOIN tot t USING (hour) CROSS JOIN nk n
),
scored AS (
    SELECT server, service,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           sqrt(list_reduce(list_prepend(0.0, list(d * d ORDER BY hour)),
                            (a, b) -> a + b)) AS dist
    FROM diffs GROUP BY server, service
)
SELECT server, service, n_events, dist,
       CAST(row_number() OVER (
           ORDER BY dist DESC, server ASC, service ASC
       ) AS INT) AS rank
FROM scored
"""


# --- cusum_changepoints: control-chart changepoint detection -----------

CUSUM_SLACK_DEN = 8  # slack kappa = tot/8  (mean/8, in n-scaled units)
CUSUM_H_NUM = 2      # threshold H = 2*tot  (2*mean accumulated excess)


def cusum_changepoints(events: DataFrame) -> DataFrame:
    """(event_type, hr, side, stat, n, tot): two-sided CUSUM control
    chart (Page 1954, public literature) over each event_type's
    zero-filled hourly count series — the classic sequential
    changepoint detector next to the z-score family's level detectors:

        S+_t = max(0, S+_{t-1} + (x_t - mean) - kappa)
        S-_t = max(0, S-_{t-1} + (mean - x_t) - kappa)

    with an alarm (and restart, the standard recycle) whenever a side
    exceeds H. All arithmetic is n-SCALED integers — deviations are
    n·x_t − tot so the mean never becomes a float; kappa = tot/8 and
    H = 2·tot in the same units — exact int64 in both engines (|S| ≤
    n·tot stays far below 2^63 on count data). Alarm rows carry the
    PRE-reset statistic, so the hash grades every detection's position,
    side, and magnitude.

    Rendering: the recursion is inherently per-key sequential, but the
    series is the GRID, not the data — one map-side-combinable hourly
    rollup, a bounded zero-filled sequence per key (the st_zerofill
    argument: the grid is retention-bounded whatever the row volume),
    then ONE in-row aggregate fold per key over the sorted array, no
    Python. The oracle replays the fold as a per-key index recursion
    with scalar state columns."""
    hourly = events.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    span = events.agg(
        F.expr("min(unix_micros(ts) div 3600000000)").alias("lo"),
        F.expr("max(unix_micros(ts) div 3600000000)").alias("hi"),
    )
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi)")).alias("hr"),
        )
    )
    filled = grid.join(hourly, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    packed = filled.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("hr", "cnt"))).alias("a"),
        F.sum("cnt").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    kap = f"(tot DIV {CUSUM_SLACK_DEN})"
    H = f"({CUSUM_H_NUM} * tot)"
    spn = f"greatest(0L, acc.sp + (n * x.cnt - tot) - {kap})"
    snn = f"greatest(0L, acc.sn + (tot - n * x.cnt) - {kap})"
    fold = f"""
aggregate(
  a,
  named_struct('sp', CAST(0 AS BIGINT), 'sn', CAST(0 AS BIGINT),
               'out', CAST(array() AS
                   array<struct<hr:bigint, side:int, stat:bigint>>)),
  (acc, x) -> named_struct(
    'sp', IF({spn} > {H}, CAST(0 AS BIGINT), {spn}),
    'sn', IF({snn} > {H}, CAST(0 AS BIGINT), {snn}),
    'out', concat(acc.out,
        IF({spn} > {H},
           array(named_struct('hr', x.hr, 'side', 1, 'stat', {spn})),
           CAST(array() AS array<struct<hr:bigint, side:int, stat:bigint>>)),
        IF({snn} > {H},
           array(named_struct('hr', x.hr, 'side', -1, 'stat', {snn})),
           CAST(array() AS array<struct<hr:bigint, side:int, stat:bigint>>)))
  ),
  acc -> acc.out
)
"""
    return (
        packed.select(
            "event_type", "tot", "n", F.explode(F.expr(fold)).alias("al")
        )
        .select(
            "event_type",
            F.col("al.hr").alias("hr"),
            F.col("al.side").alias("side"),
            F.col("al.stat").alias("stat"),
            "n",
            "tot",
        )
    )


def cusum_changepoints_oracle_sql() -> str:
    kap = f"(tot // {CUSUM_SLACK_DEN})"
    H = f"({CUSUM_H_NUM} * tot)"
    return f"""
WITH RECURSIVE cshourly AS (
    SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
), csspan AS (
    SELECT MIN(epoch_us(ts) // 3600000000) AS lo,
           MAX(epoch_us(ts) // 3600000000) AS hi
    FROM events
), csg0 AS MATERIALIZED (
    -- the left join below must not see the lateral's correlated column
    -- (DuckDB: "non-inner join on correlated columns"), so the grid
    -- expansion materializes first
    SELECT k.event_type, CAST(t.hr AS BIGINT) AS hr
    FROM (SELECT DISTINCT event_type FROM cshourly) k
    CROSS JOIN csspan s, LATERAL unnest(range(s.lo, s.hi + 1)) AS t(hr)
), csgrid AS MATERIALIZED (
    SELECT g.event_type, g.hr,
           CAST(COALESCE(h.cnt, 0) AS BIGINT) AS cnt
    FROM csg0 g
    LEFT JOIN cshourly h
         ON h.event_type = g.event_type AND h.hr = g.hr
), cskey AS MATERIALIZED (
    SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS tot,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM csgrid GROUP BY event_type
), csidx AS MATERIALIZED (
    SELECT g.event_type, g.hr, g.cnt, k.tot, k.n,
           CAST(ROW_NUMBER() OVER (PARTITION BY g.event_type
                                   ORDER BY g.hr) AS BIGINT) AS idx
    FROM csgrid g JOIN cskey k USING (event_type)
), csrec AS (
    SELECT event_type, CAST(0 AS BIGINT) AS idx,
           CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
           CAST(NULL AS BIGINT) AS hr,
           CAST(NULL AS INT) AS side_p, CAST(NULL AS BIGINT) AS stat_p,
           CAST(NULL AS INT) AS side_n, CAST(NULL AS BIGINT) AS stat_n
    FROM cskey
    UNION ALL
    SELECT s.event_type, s.idx,
           CASE WHEN s.spn > {H} THEN 0 ELSE s.spn END,
           CASE WHEN s.snn > {H} THEN 0 ELSE s.snn END,
           s.hr,
           CASE WHEN s.spn > {H} THEN 1 END,
           CASE WHEN s.spn > {H} THEN s.spn END,
           CASE WHEN s.snn > {H} THEN -1 END,
           CASE WHEN s.snn > {H} THEN s.snn END
    FROM (
        SELECT g.event_type, g.idx, g.hr, g.tot,
               greatest(0, r.sp + (g.n * g.cnt - g.tot) - {kap}) AS spn,
               greatest(0, r.sn + (g.tot - g.n * g.cnt) - {kap}) AS snn
        FROM csrec r
        JOIN csidx g ON g.event_type = r.event_type
                    AND g.idx = r.idx + 1
    ) s
)
SELECT r.event_type, r.hr, r.side_p AS side, r.stat_p AS stat, k.n, k.tot
FROM csrec r JOIN cskey k USING (event_type) WHERE r.side_p IS NOT NULL
UNION ALL
SELECT r.event_type, r.hr, r.side_n AS side, r.stat_n AS stat, k.n, k.tot
FROM csrec r JOIN cskey k USING (event_type) WHERE r.side_n IS NOT NULL
"""
