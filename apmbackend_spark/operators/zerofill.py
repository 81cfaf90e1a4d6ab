"""A2's zero-row emission and the jx gauge stream (SURVEY.md A2, S5/P11).

The reference emits one st record per KNOWN (server, service) every interval
even when the window is empty (tpm=0, stats null) — it iterates all keys it
has ever seen (stream_calc_stats.js:159-202). Batch form: build the
(interval grid x observed keys) dimension and left-join the computed stats.

The jx stream (pull_jvm_stats.js:15-84) is an out-of-engine collector; here
a deterministic synthetic gauge set per (server, minute) stands in, and the
engine-side operator is the per-(server, hour) rollup the dashboards run.

Scale: the grid is |intervals| x |keys| rows of a few columns — broadcast
the key dimension (small), range-join nothing; the left join shuffles on
(server, service, win_start) like every other keyed op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apmbackend_spark.operators.window_stats import window_stats
from apmbackend_spark.operators.zscore import st_from_window_stats

SLICE_MS = 6 * 3600 * 1000  # bound the grid for the checkable query


def st_zerofill(tx: DataFrame, slice_ms: int = SLICE_MS) -> DataFrame:
    """st records INCLUDING silent keys, over the first slice_ms of data.
    tpm = 0.0 and null stats for empty windows (entries.js:52-84 nullable
    semantics).

    The slice bound is computed IN-PLAN (broadcast the 1-row global min and
    cross-join it) rather than via a driver-side collect, so the operator
    stays a single lazy DataFrame — no extra eager scan, composable inside
    larger plans."""
    lo = tx.agg(F.min("endts").alias("__lo"))
    sliced = (
        tx.crossJoin(F.broadcast(lo))
        .where(F.col("endts") < F.col("__lo") + F.lit(slice_ms))
        .drop("__lo")
    )
    # The st seam is referenced three times below (key dimension, grid,
    # join probe); column pruning makes the three subtrees non-canonical so
    # ReuseExchange never fires and the whole tx->winstats chain would
    # compute three times in one plan. Materialize the compact seam once —
    # st is the steady-state emission, orders of magnitude smaller than tx.
    st = st_from_window_stats(window_stats(sliced)).localCheckpoint()
    # "keys it has ever seen": a key emits zero-rows only from its first
    # observed window onward (stream_calc_stats.js:159-202 iterates the
    # grown-so-far key set, never future members)
    keys = st.groupBy("server", "service").agg(
        F.min("timestamp").alias("__t0k")
    )
    grid = st.select("timestamp").distinct()
    dim = (
        grid.crossJoin(F.broadcast(keys))
        .where(F.col("timestamp") >= F.col("__t0k"))
        .drop("__t0k")
    )
    return (
        dim.join(st, ["timestamp", "server", "service"], "left")
        .select(
            "timestamp",
            "server",
            "service",
            F.coalesce(F.col("tpm"), F.lit(0.0)).alias("tpm"),
            "average",
            "per75",
            "per95",
        )
    )


def st_zerofill_oracle_sql(slice_ms: int = SLICE_MS) -> str:
    """Appends to TX_CTE + winstats CTEs (which must be built over the
    SAME sliced tx — see the query wiring)."""
    return f"""
, st AS (
    SELECT win_start AS timestamp, server, service, tpm,
           round(avg_ms, 0) AS average,
           round(p75, 0) AS per75,
           round(p95, 0) AS per95
    FROM winstats
), keys AS (
    SELECT server, service, MIN(timestamp) AS t0k FROM st
    GROUP BY server, service
), grid AS (
    SELECT DISTINCT timestamp FROM st
)
SELECT g.timestamp, k.server, k.service,
       COALESCE(s.tpm, 0.0) AS tpm,
       s.average, s.per75, s.per95
FROM grid g
JOIN keys k ON g.timestamp >= k.t0k
LEFT JOIN st s ON s.timestamp = g.timestamp
             AND s.server = k.server AND s.service = k.service
"""


TX_SLICED_SQL = f"""
SELECT * FROM tx
WHERE endts < (SELECT MIN(endts) + {SLICE_MS} FROM tx)
"""


def tx_sliced_sql(slice_ms: int = SLICE_MS) -> str:
    """Oracle twin of the in-plan slice bound (first ``slice_ms`` of data)."""
    return f"""
SELECT * FROM tx
WHERE endts < (SELECT MIN(endts) + {int(slice_ms)} FROM tx)
"""


def st_zerofill_dense(
    tx: DataFrame, slice_ms: int | None = SLICE_MS, slide_ms: int = 10_000
) -> DataFrame:
    """`st_zerofill` with a FULLY dense per-key grid: every slide-grid slot
    from a key's FIRST observed window to the global last one. This is the
    reference's true steady-state emission — it iterates the keys "it has
    ever seen" each interval (stream_calc_stats.js:159-202), so a key emits
    nothing before its first sighting and one row per interval after — and
    it is the input contract of `zscore.zscore_window_chunked`
    (trailing-ROW frames equal trailing-TIME frames only on a dense grid).

    Scale: the per-key grid is built in-plan (sequence from each key's
    first-seen slot to the broadcast global end, exploded).

    ``slice_ms=None`` disables the time slice and builds the dense grid
    over the FULL input span — the steady-state emission shape the z-score
    and alert gates consume."""
    if slide_ms % 1000 or 300_000 % slide_ms:
        # the stats layer computes on its own window/slide geometry; the
        # grid must step at exactly that slide or density silently breaks
        raise ValueError(f"slide_ms ({slide_ms}) must divide the 300 s window")
    if slice_ms is None:
        sliced = tx
    else:
        lo = tx.agg(F.min("endts").alias("__lo"))
        sliced = (
            tx.crossJoin(F.broadcast(lo))
            .where(F.col("endts") < F.col("__lo") + F.lit(slice_ms))
            .drop("__lo")
        )
    # Same three-way seam reference as `st_zerofill` (key_starts, end,
    # join probe): pin the compact winstats emission so the upstream chain
    # runs once per plan instead of three times.
    st = st_from_window_stats(
        window_stats(sliced, slide=f"{slide_ms // 1000} seconds")
    ).localCheckpoint()
    key_starts = st.groupBy("server", "service").agg(
        F.min("timestamp").alias("__t0k")
    )
    end = st.agg(F.max("timestamp").alias("__t1"))
    dim = key_starts.crossJoin(F.broadcast(end)).select(
        "server",
        "service",
        F.explode(
            F.sequence(F.col("__t0k"), F.col("__t1"), F.lit(int(slide_ms)))
        ).alias("timestamp"),
    )
    return dim.join(st, ["timestamp", "server", "service"], "left").select(
        "timestamp",
        "server",
        "service",
        F.coalesce(F.col("tpm"), F.lit(0.0)).alias("tpm"),
        "average",
        "per75",
        "per95",
    )


def st_zerofill_dense_oracle_cte(slide_ms: int = 10_000) -> str:
    """Appends to TX_CTE + tx_sliced + winstats CTEs; defines a dense `st`
    (per-key grid from first sighting, like the engine)."""
    return f"""
, key_starts AS (
    SELECT server, service, MIN(win_start) AS t0k FROM winstats
    GROUP BY server, service
), bounds AS (
    SELECT MAX(win_start) AS t1 FROM winstats
), dim AS (
    -- list-form range() accepts column arguments (the table function does
    -- not); unnest explodes it to one row per slide slot
    SELECT k.server, k.service,
           unnest(range(k.t0k, b.t1 + {int(slide_ms)}, {int(slide_ms)})) AS timestamp
    FROM key_starts k CROSS JOIN bounds b
), st AS (
    SELECT d.timestamp, d.server, d.service,
           COALESCE(w.tpm, 0.0) AS tpm,
           round(w.avg_ms, 0) AS average,
           round(w.p75, 0) AS per75,
           round(w.p95, 0) AS per95
    FROM dim d
    LEFT JOIN winstats w
      ON w.win_start = d.timestamp AND w.server = d.server
     AND w.service = d.service
)"""


# ---------------------------------------------------------------------------
# jx gauges (S5 collector stand-in + rollup)
# ---------------------------------------------------------------------------


def jmx_gauges(tx: DataFrame) -> DataFrame:
    """Synthetic jx samples: one row per (server, minute) with gauges
    derived deterministically from traffic (stands in for the jboss-cli
    poller, pull_jvm_stats.js:141-149)."""
    minute = (F.col("endts") - F.col("endts") % 60_000).alias("timestamp")
    per_min = tx.groupBy(F.col("server"), minute).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("elapsed").alias("sum_elapsed"),
        F.max("elapsed").alias("max_elapsed"),
    )
    return per_min.select(
        "timestamp",
        "server",
        (F.lit(100_000_000) + F.col("sum_elapsed") * 1000).alias("heapused"),
        F.lit(512_000_000).cast("long").alias("heapmax"),
        (F.col("n") * 7).cast("int").alias("threadcnt"),
        (F.col("max_elapsed").cast("double") / 1000.0).alias("sysload"),
    )


def jmx_rollup(tx: DataFrame) -> DataFrame:
    """Per-(server, hour) dashboard rollup over the gauge stream."""
    jx = jmx_gauges(tx)
    hour = (F.col("timestamp") - F.col("timestamp") % 3_600_000).alias("hour_ts")
    return jx.groupBy(F.col("server"), hour).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.max("heapused").alias("peak_heap"),
        (F.sum("heapused").cast("double") / F.count(F.lit(1))).alias("avg_heap"),
        F.max("threadcnt").alias("peak_threads"),
        F.max("sysload").alias("peak_sysload"),
    )


JMX_ROLLUP_ORACLE = """
, jx AS (
    SELECT (endts - endts % 60000) AS timestamp, server,
           CAST(100000000 + SUM(elapsed) * 1000 AS BIGINT) AS heapused,
           CAST(512000000 AS BIGINT) AS heapmax,
           CAST(COUNT(*) * 7 AS INT) AS threadcnt,
           CAST(MAX(elapsed) AS DOUBLE) / 1000.0 AS sysload
    FROM tx GROUP BY 1, 2
)
SELECT server, (timestamp - timestamp % 3600000) AS hour_ts,
       COUNT(*) AS n_samples,
       MAX(heapused) AS peak_heap,
       CAST(SUM(heapused) AS DOUBLE) / COUNT(*) AS avg_heap,
       MAX(threadcnt) AS peak_threads,
       MAX(sysload) AS peak_sysload
FROM jx GROUP BY 1, 2
"""
