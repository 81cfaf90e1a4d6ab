"""Sliding-window throughput/latency statistics — the reference's statistical
core (SURVEY.md A1-A5; reference ``stream_calc_stats.js:89-203``).

Semantics re-expressed Spark-first:
  * A1 10 s tumbling bucket on endts (reference :89-101) — Spark's
    `window(endtime, slide)` does the identical epoch-aligned flooring.
  * A2 5-min sliding window per (server, service) — `window(endtime,
    '300 seconds', '10 seconds')`: each event belongs to 30 sliding windows,
    grouped and aggregated in one shuffle.
  * A3 tpm = count / 5.0 (reference :186 — denominator is always the full
    window length in minutes).
  * A4 mean elapsed = exact integer SUM / COUNT (reference :162-184).
  * A5 exact p75/p95 with the midpoint rule (reference util_methods.js:112-142)
    over `sort_array(collect_list(elapsed))`.

Physical plan at scale: a single hash-partitioned shuffle on
(server, service, window) with map-side partial aggregation for count/sum;
the collect_list for exact percentiles is bounded by per-key-per-window
traffic, not data volume. AQE coalesces the post-shuffle partitions. For
unbounded keys, `window_stats_approx` swaps A5 for `percentile_approx`
(sketch-mergeable, fully map-side combinable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apmbackend_spark.functions.percentile import (
    midpoint_percentile,
    midpoint_percentile_sql,
)

WINDOW_MS = 300_000
SLIDE_MS = 10_000


def window_stats(
    tx: DataFrame,
    window: str = "300 seconds",
    slide: str = "10 seconds",
) -> DataFrame:
    """One row per (server, service, sliding window) with tpm/avg/p75/p95.

    Two-level rollup instead of the naive per-event sliding explode: events
    aggregate FIRST into their 10 s tumbling bucket (map-side combinable —
    the pre-shuffle stream is one partial row per (key, bucket) per mapper,
    not window/slide copies of every event), then each bucket row fans out
    to the window/slide windows containing it and merges. Percentiles stay
    EXACT: the merged per-window multiset is identical to the naive plan's,
    and sort_array(flatten(...)) normalizes away bucket-arrival order, so
    the result is bit-identical. At 100x the event volume the explode cost
    scales with distinct (key, bucket) groups — bounded by keys x time —
    rather than with raw event count."""
    minutes = _duration_minutes(window)
    window_ms = _duration_ms(window)
    slide_ms = _duration_ms(slide)
    if window_ms % slide_ms:
        # The bucket-partial rollup pre-aggregates at slide granularity, so a
        # bucket must be fully contained in every window it feeds; a window
        # that is not a whole number of slides would need sub-bucket splits
        # and would silently under-cover.  Reference geometry (5 min / 10 s,
        # stream_calc_stats.js:89-101) always divides evenly.
        raise ValueError(
            f"window ({window_ms} ms) must be a multiple of slide ({slide_ms} ms)"
        )
    n_win = window_ms // slide_ms
    buckets = (
        tx.groupBy(
            "server", "service", F.expr(f"endts DIV {slide_ms}").alias("_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("_bcnt"),
            F.sum("elapsed").alias("_bsum"),
            # unsorted: the post-merge sort_array normalizes, so a
            # per-bucket pre-sort is pure wasted work
            F.collect_list("elapsed").alias("_barr"),
        )
    )
    # bucket b belongs to windows starting at (b-n+1..b) * slide
    exploded = buckets.select(
        "server",
        "service",
        "_bcnt",
        "_bsum",
        "_barr",
        F.explode(
            F.sequence(F.col("_bucket") - F.lit(int(n_win - 1)), F.col("_bucket"))
        ).alias("_wb"),
    )
    # Pinned-count repartition on the merge keys: the per-window merge
    # (flatten + exact-percentile sort over collect_list arrays) is
    # compute-heavy but its input is bytes-small at bench scale, so AQE's
    # byte-based coalescing would serialize it onto one reduce task. The
    # explicit REPARTITION_BY_NUM exchange is exempt from coalescing and
    # carries the same rows the ENSURE_REQUIREMENTS exchange would
    # (partial agg cannot shrink collect_list payloads anyway).
    n_parts = max(tx.sparkSession.sparkContext.defaultParallelism, 32)
    agg = exploded.repartition(n_parts, "server", "service", "_wb").groupBy(
        "server", "service", "_wb"
    ).agg(
        F.sum("_bcnt").alias("cnt"),
        F.sum("_bsum").alias("_sum"),
        F.sort_array(F.flatten(F.collect_list("_barr"))).alias("_arr"),
    )
    return agg.select(
        "server",
        "service",
        (F.col("_wb") * F.lit(slide_ms)).cast("long").alias("win_start"),
        "cnt",
        (F.col("cnt") / F.lit(minutes)).alias("tpm"),
        (F.col("_sum").cast("double") / F.col("cnt")).alias("avg_ms"),
        midpoint_percentile(F.col("_arr"), 75).alias("p75"),
        midpoint_percentile(F.col("_arr"), 95).alias("p95"),
    )


def window_stats_approx(
    tx: DataFrame,
    window: str = "300 seconds",
    slide: str = "10 seconds",
    time_col: str = "endtime",
    accuracy: int = 10_000,
) -> DataFrame:
    """Perf path for unbounded groups: percentile_approx sketches merge
    map-side, so no per-group array ever materializes."""
    minutes = _duration_minutes(window)
    return (
        tx.groupBy("server", "service", F.window(F.col(time_col), window, slide))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.avg("elapsed").alias("avg_ms"),
            F.percentile_approx("elapsed", 0.75, accuracy).alias("p75"),
            F.percentile_approx("elapsed", 0.95, accuracy).alias("p95"),
        )
        .select(
            "server",
            "service",
            F.unix_millis("window.start").alias("win_start"),
            "cnt",
            (F.col("cnt") / F.lit(minutes)).alias("tpm"),
            "avg_ms",
            F.col("p75").cast("double").alias("p75"),
            F.col("p95").cast("double").alias("p95"),
        )
    )


def window_stats_oracle_ctes(window_ms: int = WINDOW_MS, slide_ms: int = SLIDE_MS) -> str:
    """DuckDB twin as composable CTEs (appends to TX_CTE): expand each tx row
    into its window_ms/slide_ms sliding windows, aggregate identically into a
    `winstats` CTE."""
    n_windows = window_ms // slide_ms
    minutes = window_ms / 60_000.0
    p75 = midpoint_percentile_sql("list_sort(list(elapsed))", 75)
    p95 = midpoint_percentile_sql("list_sort(list(elapsed))", 95)
    return f"""
, expanded AS (
    SELECT t.*, ((t.endts // {slide_ms}) - k.k) * {slide_ms} AS win_start
    FROM tx t CROSS JOIN (SELECT range AS k FROM range({n_windows})) k
), winstats AS (
    SELECT server, service, win_start,
           COUNT(*) AS cnt,
           COUNT(*) / {minutes!r} AS tpm,
           CAST(SUM(elapsed) AS DOUBLE) / COUNT(*) AS avg_ms,
           {p75} AS p75,
           {p95} AS p95
    FROM expanded
    GROUP BY server, service, win_start
)"""


def window_stats_oracle_sql(window_ms: int = WINDOW_MS, slide_ms: int = SLIDE_MS) -> str:
    return window_stats_oracle_ctes(window_ms, slide_ms) + "\nSELECT * FROM winstats"


def _duration_minutes(window: str) -> float:
    qty, unit = window.split()
    seconds = {"seconds": 1, "second": 1, "minutes": 60, "minute": 60}[unit] * int(qty)
    return seconds / 60.0


def _duration_ms(window: str) -> int:
    qty, unit = window.split()
    return {"seconds": 1, "second": 1, "minutes": 60, "minute": 60}[unit] * int(qty) * 1000
