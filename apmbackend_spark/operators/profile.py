"""Column-level data-quality profiling (schema-drift / ingest-QA input).

A 100 TB training pipeline gates every ingest batch on a per-column profile
— null rates, distinct cardinalities, value ranges — and diffs it against
the previous batch to catch schema drift, silently-nulled upstream fields,
and range blowouts before they poison a training run. This operator computes
that profile in ONE pass over the table and emits it long-format (one row
per column) so profiles diff as plain rows.

Plan shape: a single global aggregate — every statistic here (count, null
count, min, max, count-distinct) is map-side combinable, so the scan reduces
to one partial-agg row per task before any shuffle. The multiple exact
COUNT(DISTINCT col) expressions plan as Catalyst's Expand (each input row
replicated once per distinct-column), which is the standard exact strategy;
at 100 TB the documented flip is ``approx_count_distinct`` (HLL sketches,
no Expand, same operator shape — the gate grades exact). The long-format
pivot happens AFTER aggregation on a single driver-side row (explode of a
literal-built array), so it costs nothing.

Typed min/max: numerics profile as doubles, timestamps as epoch
microseconds (exact — micros magnitudes sit far below 2^53), strings as
binary-collation min/max in the string columns. No sums of floats anywhere,
so the whole profile is bit-deterministic across engines.

The gate profiles a deterministically dirtied view of ``events`` (value and
props NULLed on fixed event_id residues, mirrored in the oracle) — the
fixture tables are fully clean, and a profiler whose null path is never
exercised proves nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (column, kind) — kind picks which min/max slot the column profiles into.
_EVENT_COLS = (
    ("event_id", "num"),
    ("ts", "ts"),
    ("user_id", "num"),
    ("event_type", "str"),
    ("value", "num"),
    ("props", "str"),
)

# Deterministic dirt: NULL `value` on event_id % 97 == 0 and `props` on
# event_id % 89 == 0 so the null-accounting path is actually graded.
_VALUE_NULL_MOD = 97
_PROPS_NULL_MOD = 89


def _dirty_events(events: DataFrame) -> DataFrame:
    eid = F.col("event_id")
    return events.withColumn(
        "value",
        F.when(eid % _VALUE_NULL_MOD == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    ).withColumn(
        "props",
        F.when(eid % _PROPS_NULL_MOD == 0, F.lit(None)).otherwise(
            F.col("props")
        ),
    )


def _minmax_num(col: str, kind: str, agg: str):
    """Typed min/max expression for the numeric slot (NULL for strings)."""
    fn = F.min if agg == "min" else F.max
    if kind == "num":
        return fn(F.col(col)).cast("double")
    if kind == "ts":
        return fn(F.unix_micros(F.col(col))).cast("double")
    return F.lit(None).cast("double")


def table_profile(events: DataFrame) -> DataFrame:
    """One row per column: n, n_nulls, n_distinct, typed min/max.

    Physical split: min(string)/max(string) carry VAR-LENGTH aggregation
    buffers, which Spark's HashAggregate cannot hold — one such expression
    in the big aggregate demotes the WHOLE plan (including the 6x-expanded
    distinct rows) to SortAggregate, i.e. a full sort of 6x the table
    (measured 12 s vs 3.5 s at sf0.1). So the string extrema live in their
    own tiny global aggregate — grouping is empty, so its SortAggregate
    sorts nothing, and the scan prunes to just the string columns — and
    the two single-row results broadcast-join back together. Everything
    fixed-width (counts, distincts, numeric/timestamp extrema) stays in
    one hash-aggregated pass.
    """
    df = _dirty_events(events)
    aggs = [F.count(F.lit(1)).alias("__n")]
    str_aggs = []
    for c, kind in _EVENT_COLS:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
        aggs.append(_minmax_num(c, kind, "min").alias(f"{c}__minnum"))
        aggs.append(_minmax_num(c, kind, "max").alias(f"{c}__maxnum"))
        if kind == "str":
            str_aggs.append(F.min(F.col(c)).alias(f"{c}__minstr"))
            str_aggs.append(F.max(F.col(c)).alias(f"{c}__maxstr"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__minstr"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__maxstr"))
    row = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*str_aggs)))
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__minnum").alias("min_num"),
                F.col(f"{c}__maxnum").alias("max_num"),
                F.col(f"{c}__minstr").alias("min_str"),
                F.col(f"{c}__maxstr").alias("max_str"),
            )
            for c, _ in _EVENT_COLS
        ]
    )
    return row.select(F.explode(structs).alias("s")).select("s.*")


def table_profile_oracle_sql() -> str:
    dirty = f"""
    SELECT event_id, ts, user_id, event_type,
           CASE WHEN event_id % {_VALUE_NULL_MOD} = 0 THEN NULL
                ELSE value END AS value,
           CASE WHEN event_id % {_PROPS_NULL_MOD} = 0 THEN NULL
                ELSE props END AS props
    FROM events
    """
    legs = []
    for c, kind in _EVENT_COLS:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        elif kind == "ts":
            mn = f"CAST(epoch_us(MIN({c})) AS DOUBLE)"
            mx = f"CAST(epoch_us(MAX({c})) AS DOUBLE)"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        smn = f"MIN({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        smx = f"MAX({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
        legs.append(
            f"""SELECT '{c}' AS col_name,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE {c} IS NULL) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num,
       {smn} AS min_str, {smx} AS max_str
FROM dirty"""
        )
    union = "\nUNION ALL\n".join(legs)
    return f"WITH dirty AS ({dirty})\n{union}"


# ---------------------------------------------------------------------------
# Distribution drift between two ingest periods (batch-over-batch QA).
# ---------------------------------------------------------------------------

DRIFT_SPLIT_DAY = 16  # period A: day-of-month < 16, period B: >= 16
DRIFT_VALUE_BIN = 50.0  # fixed-width value bins (0-490 range -> 10 bins)


def profile_drift(events: DataFrame) -> DataFrame:
    """Distribution drift between two halves of the table (days 1-15 vs
    16+): per tracked dimension, the L1 (total-variation x2) distance
    between the two periods' key distributions, plus both row counts.

    This is the batch-over-batch gate a production ingest runs on top of
    ``table_profile``: a silent upstream change (a client version skewing
    event_type mix, a unit change scaling value) shows up as L1 drift long
    before model metrics move. Tracked dimensions: the categorical
    event_type, and value quantized into fixed-width bins (floor(v/50) —
    integer keys, no rounding-mode drift).

    Determinism: per-key rates are single exact divisions (int/int); the
    L1 sum folds |p_a - p_b| over keys IN KEY ORDER (array_sort +
    F.aggregate / list ORDER BY + list_reduce) — the engine's standard
    ordered-fold contract for cross-key float sums.

    Scale shape: one conditional-count aggregate keyed on (dim, key) —
    map-side combinable, key cardinality bounded (categories + 10 bins) —
    then a per-dim fold over that tiny key frame. The period predicate is
    a pushable column expression, so both "halves" come from the SAME
    single scan (no two-pass read).
    """
    day = F.dayofmonth(F.col("ts"))
    in_a = day < F.lit(int(DRIFT_SPLIT_DAY))
    dims = F.array(
        F.struct(
            F.lit("event_type").alias("dim"),
            F.col("event_type").alias("key"),
        ),
        F.struct(
            F.lit("value_bin").alias("dim"),
            F.floor(F.col("value") / F.lit(DRIFT_VALUE_BIN))
            .cast("string")
            .alias("key"),
        ),
    )
    keyed = events.select(in_a.alias("in_a"), F.explode(dims).alias("d")).select(
        "in_a", F.col("d.dim").alias("dim"), F.col("d.key").alias("key")
    )
    counts = keyed.groupBy("dim", "key").agg(
        F.count(F.when(F.col("in_a"), 1)).alias("ca"),
        F.count(F.when(~F.col("in_a"), 1)).alias("cb"),
    )
    w_tot = Window.partitionBy("dim")
    rated = counts.select(
        "dim",
        "key",
        "ca",
        "cb",
        F.sum("ca").over(w_tot).alias("na"),
        F.sum("cb").over(w_tot).alias("nb"),
    )
    # try_divide, not `/`: under ANSI mode (Spark 4 default) a plain
    # division THROWS on an EMPTY comparison period (found by the pinned
    # unit test); NULL rates -> NULL l1 is the contract ("no comparison
    # possible"), mirrored as an explicit CASE in the oracle because
    # DuckDB's IEEE double division would yield inf instead.
    diffs = rated.select(
        "dim",
        "na",
        "nb",
        F.struct(
            "key",
            (
                F.abs(
                    F.try_divide(
                        F.col("ca").cast("double"), F.col("na").cast("double")
                    )
                    - F.try_divide(
                        F.col("cb").cast("double"), F.col("nb").cast("double")
                    )
                )
            ).alias("d"),
        ).alias("kd"),
    )
    return diffs.groupBy("dim").agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.aggregate(
            F.array_sort(F.collect_list("kd")),
            F.lit(0.0),
            lambda acc, x: acc + x["d"],
        ).alias("l1"),
    )


def profile_drift_oracle_sql() -> str:
    return f"""
WITH keyed AS (
    SELECT (date_part('day', ts) < {int(DRIFT_SPLIT_DAY)}) AS in_a,
           dim, key
    FROM events, LATERAL (
        VALUES ('event_type', event_type),
               ('value_bin', CAST(CAST(floor(value / {DRIFT_VALUE_BIN!r}) AS BIGINT) AS VARCHAR))
    ) AS t(dim, key)
), counts AS (
    SELECT dim, key,
           COUNT(*) FILTER (WHERE in_a) AS ca,
           COUNT(*) FILTER (WHERE NOT in_a) AS cb
    FROM keyed GROUP BY dim, key
), rated AS (
    SELECT dim, key, ca, cb,
           SUM(ca) OVER (PARTITION BY dim) AS na,
           SUM(cb) OVER (PARTITION BY dim) AS nb
    FROM counts
)
SELECT dim,
       CAST(MAX(na) AS BIGINT) AS n_a,
       CAST(MAX(nb) AS BIGINT) AS n_b,
       COUNT(*) AS n_keys,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
               list(abs(
                   (CASE WHEN na = 0 THEN NULL
                         ELSE CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) END)
                 - (CASE WHEN nb = 0 THEN NULL
                         ELSE CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) END))
                    ORDER BY key)),
           (a, b) -> a + b) AS l1
FROM rated
GROUP BY dim
"""


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters (bounded-memory frequency estimation).
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # independent hash rows
CMS_WIDTH = 64  # counters per row — deliberately small so the fixture
# actually exercises collisions (overestimates are part of the gate)
CMS_HOT_FACTOR = 1.2  # heavy hitter: estimate > factor * (n / n_keys)


def heavy_hitters_cms(events: DataFrame) -> DataFrame:
    """Heavy-hitter detection through a count-min sketch, with the exact
    count alongside so the sketch's one-sided error (est >= exact, always)
    is itself graded.

    Why a sketch when a groupBy gives exact counts: the skew-handling
    split (``skew.py``) needs the HOT KEY SET before it can salt, and at
    100 TB with billions of distinct keys the exact pre-aggregation is
    itself the skewed shuffle you were trying to avoid. The CMS pass
    shuffles a frame bounded at depth x width rows (here 4 x 64) NO
    MATTER the key cardinality — each task map-side-combines its
    (seed, bucket) counts, so the sketch costs one scan plus a
    constant-size exchange; the hot-key probe then broadcasts the sketch.

    Determinism: the d hash rows come from the engine's md5-derived
    60-bit hash (``functions/text.hash64``) with the seed concatenated
    into the key — identical in DuckDB, so buckets, counters, and every
    estimate replay exactly. All integers; no floats anywhere except the
    final threshold compare (one multiply of exact ints).

    Output: each key whose estimate exceeds ``CMS_HOT_FACTOR`` x the mean
    key load, with est (CMS estimate), exact_n, and the overestimate —
    collision error made visible and hash-graded.
    """
    keyed = events.select(F.col("user_id").alias("key"))
    sketch = cms_hashed(keyed).groupBy("seed", "bucket").agg(
        F.count(F.lit(1)).alias("counter")
    )
    return cms_finish(sketch, keyed)


def cms_hashed(keyed: DataFrame) -> DataFrame:
    """(seed, bucket) insert rows for a (key) frame — the map side of the
    sketch. The COUNT rollup over these is merge-safe (sums), which is why
    the same aggregation can live in a streaming state store (stream_cms)."""
    from apmbackend_spark.functions.text import hash64

    seeds = F.array(*[F.lit(s) for s in range(CMS_DEPTH)])
    return keyed.select(
        "key", F.explode(seeds).alias("seed")
    ).select(
        "seed",
        (
            hash64(
                F.concat(
                    F.lit("cms"),
                    F.col("seed").cast("string"),
                    F.lit(":"),
                    F.col("key").cast("string"),
                )
            )
            % CMS_WIDTH
        ).alias("bucket"),
    )


def cms_finish(sketch: DataFrame, keyed: DataFrame) -> DataFrame:
    """Probe the sketch for every key and emit the graded heavy-hitter
    rows — shared by the batch gate and the streaming gate's post-drain
    finish."""
    from apmbackend_spark.functions.text import hash64

    seeds = F.array(*[F.lit(s) for s in range(CMS_DEPTH)])
    exact = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.select(
        "key", "exact_n", F.explode(seeds).alias("seed")
    ).select(
        "key",
        "exact_n",
        "seed",
        (
            hash64(
                F.concat(
                    F.lit("cms"),
                    F.col("seed").cast("string"),
                    F.lit(":"),
                    F.col("key").cast("string"),
                )
            )
            % CMS_WIDTH
        ).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("counter").alias("est"))
    )
    totals = keyed.agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct("key").alias("__k"),
    )
    return (
        est.crossJoin(F.broadcast(totals))
        .where(
            F.col("est").cast("double")
            > F.lit(CMS_HOT_FACTOR)
            * (F.col("__n").cast("double") / F.col("__k").cast("double"))
        )
        .select(
            "key",
            "est",
            "exact_n",
            (F.col("est") - F.col("exact_n")).alias("overestimate"),
        )
    )


def heavy_hitters_cms_oracle_sql() -> str:
    from apmbackend_spark.functions.text import hash64_sql

    seeds = ", ".join(f"({s})" for s in range(CMS_DEPTH))
    h = hash64_sql("'cms' || CAST(s.seed AS VARCHAR) || ':' || CAST(key AS VARCHAR)")
    return f"""
WITH seeds(seed) AS (VALUES {seeds}),
keyed AS (SELECT user_id AS key FROM events),
hashed AS (
    SELECT s.seed, ({h}) % {CMS_WIDTH} AS bucket
    FROM keyed CROSS JOIN seeds s
),
sketch AS (
    SELECT seed, bucket, COUNT(*) AS counter FROM hashed GROUP BY seed, bucket
),
exact AS (SELECT key, COUNT(*) AS exact_n FROM keyed GROUP BY key),
probes AS (
    SELECT key, exact_n, s.seed, ({h}) % {CMS_WIDTH} AS bucket
    FROM exact CROSS JOIN seeds s
),
est AS (
    SELECT p.key, p.exact_n, MIN(sk.counter) AS est
    FROM probes p JOIN sketch sk ON p.seed = sk.seed AND p.bucket = sk.bucket
    GROUP BY p.key, p.exact_n
),
totals AS (
    SELECT COUNT(*) AS n, COUNT(DISTINCT key) AS k FROM keyed
)
SELECT e.key, e.est, e.exact_n, e.est - e.exact_n AS overestimate
FROM est e, totals t
WHERE CAST(e.est AS DOUBLE)
      > {CMS_HOT_FACTOR} * (CAST(t.n AS DOUBLE) / CAST(t.k AS DOUBLE))
"""


# ---------------------------------------------------------------------------
# Histogram-sketch quantiles: the mergeable scale path for percentiles.
# ---------------------------------------------------------------------------
# The engine's exact midpoint percentile (functions/percentile.py, reference
# util_methods.js:112-142) needs each group's full multiset — fine for
# traffic-bounded windows, unusable for an unbounded 100 TB column. The
# standard fix is a fixed-shape mergeable sketch: bucket values into
# power-of-two bins (floor(log2(cents)), computed as bit-length so the
# binning is pure INTEGER arithmetic — no log() call whose libm rounding
# could differ across engines), count per bin, and read quantiles back by
# linear interpolation inside the target bin. The sketch is a (|groups| x
# <=64)-row frame regardless of input volume, every stage is map-side
# combinable, and two sketches merge by adding counts — the streaming /
# multi-day rollup shape. Relative error is bounded by the bin ratio (2x
# worst case; the pytest guard asserts the measured bound against the exact
# percentile).

HIST_QS = (50.0, 95.0, 99.0)


def _hist_est(arr, n, q: float):
    """Interpolated quantile from the sorted (bin, cnt) array: fold keeps
    (cum, est), fills est in the first bin where cum reaches ceil(q*n)."""
    target = F.ceil(F.lit(q / 100.0) * n.cast("double")).cast("long")
    init = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(None).cast("double").alias("est"),
    )

    def step(acc, x):
        lo = x["lo"].cast("double")
        frac = (target - acc["cum"]).cast("double") / x["cnt"].cast("double")
        return F.struct(
            (acc["cum"] + x["cnt"]).alias("cum"),
            F.coalesce(
                acc["est"],
                F.when(acc["cum"] + x["cnt"] >= target, lo + lo * frac),
            ).alias("est"),
        )

    # est is in cents: /100.0 back to value units (one extra double op,
    # identical on both engines).
    return F.aggregate(arr, init, step)["est"] / F.lit(100.0)


def hist_quantiles(events: DataFrame) -> DataFrame:
    """Per event_type: n plus sketched p50/p95/p99 of `value`.

    Bin index = bit_length(cents) - 1 via the binary-string length (Spark
    `bin()` and DuckDB `bin()` render identically); non-positive cents
    clamp to 1 so the sketch is total on dirty inputs.
    """
    cents = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long"),
    )
    binned = (
        events.where(F.col("value").isNotNull())
        .select("event_type", (F.length(F.bin(cents)) - 1).alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    # lo = 2^bin as an exact integer (shiftleft, never pow()): carried in
    # the element struct because the HOF lambda can't take a literal shift
    binned = binned.withColumn(
        "lo", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bin AS INT))")
    )
    g = binned.groupBy("event_type").agg(
        F.sum("cnt").alias("n"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col("bin"), F.col("cnt"), F.col("lo"))
            )
        ).alias("arr"),
    )
    n = F.col("n")
    return g.select(
        "event_type",
        n.cast("long").alias("n"),
        *[
            _hist_est(F.col("arr"), n, q).alias(f"q{int(q)}")
            for q in HIST_QS
        ],
    )


def _hist_est_sql(q: float) -> str:
    # DuckDB list_reduce has no init value: prepend a zero accumulator of
    # the SAME struct type as the transformed elements (the funnel_steps
    # unified-struct pattern) and fold left-to-right over the sorted bins.
    # The lambda body MUST be a whole-struct CASE, not one struct_pack
    # with per-field conditionals: DuckDB 1.0 mis-resolves `a.<field>`
    # references inside a bare struct_pack lambda body (a.cum reads the
    # NEW cum — verified probe), while the funnel-style CASE-of-structs
    # form evaluates the accumulator correctly.
    target = f"CAST(ceil({q / 100.0!r} * CAST(n AS DOUBLE)) AS BIGINT)"
    lo = "CAST(x.lo AS DOUBLE)"
    return f"""
        list_reduce(
            list_prepend(
                struct_pack(cum := CAST(0 AS BIGINT),
                            est := CAST(NULL AS DOUBLE),
                            cnt := CAST(0 AS BIGINT),
                            lo := CAST(0 AS BIGINT)),
                list_transform(
                    arr,
                    e -> struct_pack(cum := e.cnt,
                                     est := CAST(NULL AS DOUBLE),
                                     cnt := e.cnt, lo := e.lo)
                )
            ),
            (a, x) -> CASE
                WHEN a.est IS NULL AND a.cum + x.cnt >= {target}
                THEN struct_pack(
                        cum := a.cum + x.cnt,
                        est := {lo} + {lo}
                               * (CAST({target} - a.cum AS DOUBLE)
                                  / CAST(x.cnt AS DOUBLE)),
                        cnt := CAST(0 AS BIGINT), lo := CAST(0 AS BIGINT))
                ELSE struct_pack(
                        cum := a.cum + x.cnt, est := a.est,
                        cnt := CAST(0 AS BIGINT), lo := CAST(0 AS BIGINT))
            END
        ).est / 100.0"""


def hist_quantiles_oracle_sql() -> str:
    ests = ",\n       ".join(
        f"({_hist_est_sql(q)}) AS q{int(q)}" for q in HIST_QS
    )
    return f"""
WITH binned AS (
    SELECT event_type,
           length(bin(GREATEST(
               CAST(1 AS BIGINT),
               CAST(floor(value * 100.0 + 0.5) AS BIGINT)))) - 1 AS bin,
           COUNT(*) AS cnt
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
), g AS (
    SELECT event_type,
           CAST(SUM(cnt) AS BIGINT) AS n,
           list_sort(list({{'bin': CAST(bin AS BIGINT),
                            'cnt': CAST(cnt AS BIGINT),
                            'lo': CAST(1::BIGINT << CAST(bin AS INT)
                                       AS BIGINT)}})) AS arr
    FROM binned GROUP BY event_type
)
SELECT event_type, n,
       {ests}
FROM g
"""


# ---------------------------------------------------------------------------
# Sub-octave histogram quantiles: the higher-resolution mergeable sketch.
# ---------------------------------------------------------------------------
# hist_quantiles' power-of-two bins bound relative error at 2x — right for
# long-tailed latency distributions, useless when a metric clusters inside
# one octave (measured on the CCNet LM score, where octave bins gave 0.33
# bucket agreement vs the exact percentiles). The HDR-histogram / DDSketch
# fix: 64 sub-bins per octave from pure INTEGER shifts (bit-length octave +
# top-6-bits mantissa), bounding relative error at 1/64 while staying a
# fixed-shape mergeable sketch (<=4096 bins per group; merge = add counts).
# First consumer: langid.ccnet_buckets_sketch; subbin_quantiles below is
# the latency-family form over events.value.


def _subbin_est(arr, n, q: float):
    """Interpolated quantile from the sorted (lo, width, cnt) sub-octave
    bin array (_hist_est generalized to variable-width bins):
    fold keeps (cum, est); est fills in the first bin where cum reaches
    ceil(q*n), interpolating lo + width * frac. /100 back to score
    units (identical double ops both engines)."""
    target = F.ceil(F.lit(q / 100.0) * n.cast("double")).cast("long")
    init = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(None).cast("double").alias("est"),
    )

    def step(acc, x):
        lo = x["lo"].cast("double")
        w = x["width"].cast("double")
        frac = (target - acc["cum"]).cast("double") / x["cnt"].cast("double")
        return F.struct(
            (acc["cum"] + x["cnt"]).alias("cum"),
            F.coalesce(
                acc["est"],
                F.when(acc["cum"] + x["cnt"] >= target, lo + w * frac),
            ).alias("est"),
        )

    return F.aggregate(arr, init, step)["est"] / F.lit(100.0)


def _subbin_est_sql(q: float) -> str:
    """DuckDB twin of ``_subbin_est`` — the CASE-of-structs list_reduce
    form (_hist_est_sql's documented workaround for DuckDB's
    struct_pack lambda field resolution)."""
    target = f"CAST(ceil({q / 100.0!r} * CAST(n AS DOUBLE)) AS BIGINT)"
    zero = "cnt := CAST(0 AS BIGINT), lo := CAST(0 AS BIGINT), width := CAST(0 AS BIGINT)"
    return f"""
        list_reduce(
            list_prepend(
                struct_pack(cum := CAST(0 AS BIGINT),
                            est := CAST(NULL AS DOUBLE), {zero}),
                list_transform(
                    arr,
                    e -> struct_pack(cum := e.cnt,
                                     est := CAST(NULL AS DOUBLE),
                                     cnt := e.cnt, lo := e.lo,
                                     width := e.width)
                )
            ),
            (a, x) -> CASE
                WHEN a.est IS NULL AND a.cum + x.cnt >= {target}
                THEN struct_pack(
                        cum := a.cum + x.cnt,
                        est := CAST(x.lo AS DOUBLE)
                               + CAST(x.width AS DOUBLE)
                               * (CAST({target} - a.cum AS DOUBLE)
                                  / CAST(x.cnt AS DOUBLE)),
                        {zero})
                ELSE struct_pack(cum := a.cum + x.cnt, est := a.est, {zero})
            END
        ).est / 100.0"""


def subbin_quantiles(events: DataFrame) -> DataFrame:
    """Per event_type: n plus sub-octave-sketched p50/p95/p99 of `value` —
    hist_quantiles' drop-in with 64 sub-bins per octave (1/64 relative
    error instead of 2x). Identical scale shape: one map-side-combinable
    (group, bin) rollup, per-group arrays <=4096 whatever the volume."""
    cents = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long"),
    )
    binned = (
        events.where(F.col("value").isNotNull())
        .select("event_type", cents.alias("c"))
        .withColumn(
            "shift",
            F.greatest(F.length(F.bin(F.col("c"))) - 7, F.lit(0)).cast("int"),
        )
        .select(
            "event_type",
            F.expr("shiftleft(shiftright(c, shift), shift)").alias("lo"),
            F.expr("shiftleft(CAST(1 AS BIGINT), shift)").alias("width"),
        )
        .groupBy("event_type", "lo", "width")
        .agg(F.count("*").alias("cnt"))
    )
    g = binned.groupBy("event_type").agg(
        F.sum("cnt").alias("n"),
        F.array_sort(
            F.collect_list(F.struct(F.col("lo"), F.col("width"), F.col("cnt")))
        ).alias("arr"),
    )
    n = F.col("n")
    return g.select(
        "event_type",
        n.cast("long").alias("n"),
        *[_subbin_est(F.col("arr"), n, q).alias(f"q{int(q)}") for q in HIST_QS],
    )


def subbin_quantiles_oracle_sql() -> str:
    ests = ",\n       ".join(
        f"({_subbin_est_sql(q)}) AS q{int(q)}" for q in HIST_QS
    )
    return f"""
WITH binned AS (
    SELECT event_type,
           CAST((c >> shift) << shift AS BIGINT) AS lo,
           CAST(1::BIGINT << shift AS BIGINT) AS width,
           COUNT(*) AS cnt
    FROM (
        SELECT event_type, c,
               CAST(GREATEST(length(bin(c)) - 7, 0) AS INT) AS shift
        FROM (
            SELECT event_type,
                   GREATEST(CAST(1 AS BIGINT),
                            CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS c
            FROM events WHERE value IS NOT NULL
        )
    )
    GROUP BY 1, 2, 3
), g AS (
    SELECT event_type,
           CAST(SUM(cnt) AS BIGINT) AS n,
           list_sort(list({{'lo': CAST(lo AS BIGINT),
                            'width': CAST(width AS BIGINT),
                            'cnt': CAST(cnt AS BIGINT)}})) AS arr
    FROM binned GROUP BY event_type
)
SELECT event_type, n,
       {ests}
FROM g
"""


# ---------------------------------------------------------------------------
# Declarative data-quality rule audit (expectation-suite shape).
# ---------------------------------------------------------------------------
# A production ingest gates every batch on a rule suite ("value is
# non-negative", "timestamp inside the load window", "enum in its domain",
# ...) and wants, per rule: how many rows violate it, the violation rate,
# and bracketing example keys for triage. This operator evaluates the WHOLE
# suite in ONE pass: each rule contributes a conditional count + min/max
# violating key to a single map-side-combinable aggregate row, which then
# pivots long-format (one row per rule) driver-cheaply — the table_profile
# discipline applied to rule checking. Rules are data, not code forks: the
# suite is a literal list of (name, violation-predicate) pairs rendered
# into both engines.

_KNOWN_TYPES = ("click", "view", "purchase", "signup", "error")

# Deterministic dirt (the fixture is clean; an auditor whose failure path
# is never exercised proves nothing) — mirrored in the oracle.
_DQ_NEG_MOD = 101  # value flipped negative
_DQ_BIG_MOD = 103  # value inflated out of range
_DQ_TYPE_MOD = 107  # event_type replaced with an unknown label
_DQ_USER_MOD = 109  # user_id NULLed

DQ_VALUE_MAX = 500.0


def _dq_dirty(events: DataFrame) -> DataFrame:
    eid = F.col("event_id")
    return events.select(
        "event_id",
        "ts",
        F.when(eid % _DQ_USER_MOD == 0, F.lit(None)).otherwise(
            F.col("user_id")
        ).alias("user_id"),
        F.when(eid % _DQ_TYPE_MOD == 0, F.lit("__bogus__")).otherwise(
            F.col("event_type")
        ).alias("event_type"),
        F.when(eid % _DQ_NEG_MOD == 0, -F.col("value"))
        .when(eid % _DQ_BIG_MOD == 0, F.col("value") + F.lit(10_000.0))
        .otherwise(F.col("value"))
        .alias("value"),
        "props",
    )


def _dq_rules_spark() -> list[tuple[str, F.Column]]:
    ts = F.col("ts")
    return [
        ("value_non_negative", F.col("value") < 0),
        ("value_in_range", F.col("value") > F.lit(DQ_VALUE_MAX)),
        ("user_id_present", F.col("user_id").isNull()),
        ("event_type_in_domain", ~F.col("event_type").isin(*_KNOWN_TYPES)),
        (
            "ts_in_load_window",
            (ts < F.lit("2024-01-01").cast("timestamp"))
            | (ts >= F.lit("2024-02-01").cast("timestamp")),
        ),
    ]


def _dq_rules_sql() -> list[tuple[str, str]]:
    known = ", ".join(f"'{t}'" for t in _KNOWN_TYPES)
    return [
        ("value_non_negative", "value < 0"),
        ("value_in_range", f"value > {DQ_VALUE_MAX!r}"),
        ("user_id_present", "user_id IS NULL"),
        (
            "event_type_in_domain",
            f"event_type NOT IN ({known})",
        ),
        (
            "ts_in_load_window",
            "(ts < TIMESTAMP '2024-01-01' OR ts >= TIMESTAMP '2024-02-01')",
        ),
    ]


def dq_rules(events: DataFrame) -> DataFrame:
    """Evaluate the rule suite over the (deterministically dirtied) events
    batch: one row per rule with n_violations, violation rate, and the
    min/max violating event_id.

    NULL semantics: a rule fires only where its predicate is TRUE —
    NULL-valued predicates (e.g. `value < 0` on a NULL value) do not
    count, matching SQL filter semantics in both engines.
    """
    d = _dq_dirty(events)
    aggs = []
    for name, bad in _dq_rules_spark():
        aggs += [
            F.count(F.when(bad, 1)).alias(f"{name}__n"),
            F.min(F.when(bad, F.col("event_id"))).alias(f"{name}__min"),
            F.max(F.when(bad, F.col("event_id"))).alias(f"{name}__max"),
        ]
    wide = d.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"{name}__n").alias("n_violations"),
                F.col(f"{name}__min").alias("first_bad_id"),
                F.col(f"{name}__max").alias("last_bad_id"),
            )
            for name, _ in _dq_rules_spark()
        ]
    )
    long = wide.select(
        F.col("__total"), F.explode(entries).alias("e")
    )
    return long.select(
        F.col("e.rule").alias("rule"),
        F.col("e.n_violations").cast("long").alias("n_violations"),
        F.col("e.first_bad_id").alias("first_bad_id"),
        F.col("e.last_bad_id").alias("last_bad_id"),
        (
            F.col("e.n_violations").cast("double")
            / F.col("__total").cast("double")
        ).alias("violation_rate"),
    )


def dq_rules_oracle_sql() -> str:
    known = ", ".join(f"'{t}'" for t in _KNOWN_TYPES)
    rule_rows = ",\n    ".join(
        f"""struct_pack(
        rule := '{name}',
        n_violations := CAST(COUNT(*) FILTER ({bad}) AS BIGINT),
        first_bad_id := MIN(event_id) FILTER ({bad}),
        last_bad_id := MAX(event_id) FILTER ({bad}))"""
        for name, bad in _dq_rules_sql()
    )
    return f"""
WITH d AS (
    SELECT event_id, ts,
           CASE WHEN event_id % {_DQ_USER_MOD} = 0 THEN NULL
                ELSE user_id END AS user_id,
           CASE WHEN event_id % {_DQ_TYPE_MOD} = 0 THEN '__bogus__'
                ELSE event_type END AS event_type,
           CASE WHEN event_id % {_DQ_NEG_MOD} = 0 THEN -value
                WHEN event_id % {_DQ_BIG_MOD} = 0 THEN value + 10000.0
                ELSE value END AS value
    FROM events
), wide AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS total,
           [{rule_rows}] AS entries
    FROM d
)
SELECT e.rule AS rule,
       e.n_violations AS n_violations,
       e.first_bad_id AS first_bad_id,
       e.last_bad_id AS last_bad_id,
       CAST(e.n_violations AS DOUBLE) / CAST(total AS DOUBLE)
           AS violation_rate
FROM wide, unnest(entries) AS t(e)
"""


# ---------------------------------------------------------------------------
# Pivoted activity matrix (the relational pivot surface).
# ---------------------------------------------------------------------------


def pivot_matrix(events: DataFrame) -> DataFrame:
    """day × event_type count matrix via Spark's native pivot: one
    map-side-combinable aggregate (the type list is pinned, so Spark
    plans a single pass — no distinct-values pre-query), wide columns
    named by type, plus a row total.

    Scale: identical cost to the long-format groupBy; the pivot is a
    projection shape, not an extra shuffle.
    """
    wide = (
        events.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", list(_KNOWN_TYPES))
        .count()
    )
    total = sum((F.coalesce(F.col(t), F.lit(0)) for t in _KNOWN_TYPES), F.lit(0))
    return wide.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
            for t in _KNOWN_TYPES
        ],
        total.cast("long").alias("total"),
    )


def pivot_matrix_oracle_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
        for t in _KNOWN_TYPES
    )
    return f"""
SELECT CAST(ts AS DATE) AS day,
       {cols},
       CAST(COUNT(*) FILTER (event_type IN
            ({", ".join(f"'{t}'" for t in _KNOWN_TYPES)})) AS BIGINT)
           AS total
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Cross-table referential-integrity audit (the join-shaped DQ class).
# ---------------------------------------------------------------------------
# dq_rules covers row-local expectations; the other half of an ingest gate
# is CROSS-table: does every fact row still have its dimension parent after
# this load? Orphaned foreign keys (a customer purge racing the order load,
# a partial dimension refresh) silently turn inner-join analytics into row
# loss. This operator audits each declared relationship with ONE anti-join
# and emits a per-relationship summary row.
#
# Deterministic dirt: the parent sides drop fixed key residues (the
# fixture is referentially clean end-to-end; an integrity auditor whose
# orphan path is never exercised proves nothing) — mirrored in the oracle.

_FK_CUST_DROP_MOD = 31  # customers dropped -> orders orphans
_FK_ORD_DROP_MOD = 37  # orders dropped -> lineitem orphans


def _fk_leg(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, rel: str
) -> DataFrame:
    orphans = child.join(
        parent.select(F.col(pk).alias("__pk")),
        child[fk] == F.col("__pk"),
        "left_anti",
    )
    tot = child.agg(F.count(F.lit(1)).alias("n_child"))
    orp = orphans.agg(
        F.count(F.lit(1)).alias("n_orphans"),
        F.min(F.col(fk)).alias("first_orphan_key"),
        F.max(F.col(fk)).alias("last_orphan_key"),
    )
    return (
        tot.crossJoin(orp)  # two single-row aggregates
        .select(
            F.lit(rel).alias("rel"),
            F.col("n_child").cast("long").alias("n_child"),
            F.col("n_orphans").cast("long").alias("n_orphans"),
            "first_orphan_key",
            "last_orphan_key",
            (
                F.lit(1.0)
                - F.col("n_orphans").cast("double")
                / F.col("n_child").cast("double")
            ).alias("coverage"),
        )
    )


def fk_integrity(
    orders: DataFrame, customer: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Audit orders→customer and lineitem→orders referential integrity
    against deterministically thinned parent views: one row per
    relationship with orphan counts, bracketing orphan keys, and
    coverage.

    Plan shape: one LEFT ANTI join per relationship, child scans pruned
    to the FK column, parent scans to the PK; the per-leg rollups are
    single-row aggregates, so the union is driver-cheap. At 100 TB each
    anti-join is one shuffle per side (zero-exchange when child and
    parent are bucketed on the key, the cdc_diff posture).
    """
    cust_thin = customer.where(
        F.col("c_custkey") % _FK_CUST_DROP_MOD != 0
    )
    ord_thin = orders.where(F.col("o_orderkey") % _FK_ORD_DROP_MOD != 0)
    legs = [
        _fk_leg(
            orders.select("o_custkey"),
            "o_custkey",
            cust_thin,
            "c_custkey",
            "orders.o_custkey -> customer.c_custkey",
        ),
        _fk_leg(
            lineitem.select("l_orderkey"),
            "l_orderkey",
            ord_thin,
            "o_orderkey",
            "lineitem.l_orderkey -> orders.o_orderkey",
        ),
    ]
    return legs[0].unionByName(legs[1])


def fk_integrity_oracle_sql() -> str:
    def leg(child, fk, parent_sql, rel):
        return f"""
SELECT '{rel}' AS rel,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_child,
       CAST(COUNT(*) AS BIGINT) AS n_orphans,
       MIN({fk}) AS first_orphan_key,
       MAX({fk}) AS last_orphan_key,
       1.0 - CAST(COUNT(*) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM {child}) AS DOUBLE) AS coverage
FROM {child} c
WHERE NOT EXISTS (SELECT 1 FROM ({parent_sql}) p WHERE p.pk = c.{fk})"""

    cust = (
        "SELECT c_custkey AS pk FROM customer "
        f"WHERE c_custkey % {_FK_CUST_DROP_MOD} <> 0"
    )
    ords = (
        "SELECT o_orderkey AS pk FROM orders "
        f"WHERE o_orderkey % {_FK_ORD_DROP_MOD} <> 0"
    )
    return (
        leg("orders", "o_custkey", cust,
            "orders.o_custkey -> customer.c_custkey")
        + "\nUNION ALL\n"
        + leg("lineitem", "l_orderkey", ords,
              "lineitem.l_orderkey -> orders.o_orderkey")
    )


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------

K_ANON_LADDER = (2, 5, 10, 25)
K_ANON_USER_BUCKETS = 101


def k_anonymity(
    events: DataFrame, ladder: tuple[int, ...] = K_ANON_LADDER
) -> DataFrame:
    """Privacy-audit profile before a data release: for each k in the
    ladder, how many quasi-identifier equivalence classes (and what
    fraction of records) fall below k-anonymity, plus the global
    l-diversity floor. ``pii_scrub`` removes direct identifiers; this
    measures the RE-IDENTIFICATION surface that remains — the released
    quasi-identifiers here are (event_type, day, user-bucket), the
    sensitive attribute is the integer-rounded amount.

    One map-side-combinable rollup builds the class frame (size +
    distinct-sensitive per class); every ladder row is then a conditional
    aggregate over that TINY frame (|classes| rows, bounded by the QI
    domain, never by event volume) crossed with the broadcast ladder.
    All counts integer; the record fraction is one exactly-rounded
    division.
    """
    day = F.expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)")
    classes = (
        events.select(
            "event_type",
            day.alias("day"),
            (F.col("user_id") % F.lit(K_ANON_USER_BUCKETS)).alias("ubucket"),
            F.round(F.col("value"), 0).cast("long").alias("sens"),
        )
        .groupBy("event_type", "day", "ubucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("sens").alias("l_div"),
        )
    )
    lad = events.sparkSession.createDataFrame(
        [(int(k),) for k in ladder], "k int"
    )
    return (
        classes.crossJoin(F.broadcast(lad))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum(F.when(F.col("n_rows") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("classes_below"),
            F.sum(
                F.when(F.col("n_rows") < F.col("k"), F.col("n_rows")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("records_below"),
            F.sum("n_rows").alias("n_records"),
            F.min("n_rows").alias("min_class_size"),
            F.min("l_div").alias("min_l_diversity"),
        )
        .select(
            "k",
            "n_classes",
            "classes_below",
            "records_below",
            (
                F.col("records_below").cast("double")
                / F.col("n_records").cast("double")
            ).alias("frac_records_below"),
            "min_class_size",
            "min_l_diversity",
        )
    )


def k_anonymity_oracle_sql(ladder: tuple[int, ...] = K_ANON_LADDER) -> str:
    lvals = ", ".join(f"({int(k)})" for k in ladder)
    return f"""
WITH classes AS (
    SELECT event_type,
           CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
           user_id % {K_ANON_USER_BUCKETS} AS ubucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT CAST(round(value, 0) AS BIGINT)) AS BIGINT)
               AS l_div
    FROM events
    GROUP BY event_type, day, ubucket
),
ladder(k) AS (VALUES {lvals})
SELECT k,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN n_rows < k THEN 1 ELSE 0 END) AS BIGINT)
           AS classes_below,
       CAST(SUM(CASE WHEN n_rows < k THEN n_rows ELSE 0 END) AS BIGINT)
           AS records_below,
       CAST(SUM(CASE WHEN n_rows < k THEN n_rows ELSE 0 END) AS DOUBLE)
           / CAST(SUM(n_rows) AS DOUBLE) AS frac_records_below,
       CAST(MIN(n_rows) AS BIGINT) AS min_class_size,
       CAST(MIN(l_div) AS BIGINT) AS min_l_diversity
FROM classes CROSS JOIN ladder
GROUP BY k
"""
