"""Scale-stress harness: measure how the APM chain scales with data volume.

Tiles the sf0.1 events fixture K times (time-shifted by the span per copy,
event_id offset to stay unique) into /tmp, then times the headline chain at
1x and Kx and prints per-query wall seconds plus the observed scaling factor.
A factor near K on a K-times dataset = linear scaling (what the partitioned
designs claim); super-linear factors flag an operator whose plan degrades
with volume.

Usage: python scripts/scale_stress.py [K] [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def tile_events(spark, sf_dir: str, out_dir: str, k: int) -> str:
    """K time-shifted copies of events; each copy's ts range follows the
    previous one so the (server, service) key set stays FIXED while the
    series length grows Kx — the shape a longer retention window produces."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi, n = ev.agg(
        F.min("ts"), F.max("ts"), F.count(F.lit(1))
    ).first()
    span_us = int((hi - lo).total_seconds() * 1_000_000) + 60_000_000
    copies = []
    for i in range(k):
        copies.append(
            ev.select(
                (F.col("event_id") + F.lit(i * int(n))).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {i * span_us} MICROSECONDS")).alias(
                    "ts"
                ),
                "user_id",
                "event_type",
                "value",
                "props",
            )
        )
    tiled = copies[0]
    for c in copies[1:]:
        tiled = tiled.unionAll(c)
    dest = os.path.join(out_dir, "events.parquet")
    tiled.repartition(32).write.mode("overwrite").parquet(dest)
    return out_dir


def chain_timings(spark, sf_dir: str) -> dict[str, float]:
    from apmbackend_spark.operators import alerts as al
    from apmbackend_spark.operators import zscore as zs
    from apmbackend_spark.operators.window_stats import window_stats
    from apmbackend_spark.sources.tx import load_tx

    import __spark_entry__ as e

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}

    def timed(name, thunk):
        t0 = time.perf_counter()
        force(thunk())
        out[name] = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()

    timed("tx_scan", lambda: load_tx(spark, sf_dir))
    timed("window_stats", lambda: window_stats(load_tx(spark, sf_dir)))
    timed(
        "zscore",
        lambda: zs.zscore_window(
            zs.st_from_window_stats(window_stats(load_tx(spark, sf_dir))),
            lags=e.ZSCORE_LAGS,
            threshold=e.ZSCORE_THRESHOLD,
        ),
    )
    timed(
        "zscore_recursive",
        lambda: zs.zscore_recursive(
            zs.st_from_window_stats(window_stats(load_tx(spark, sf_dir))),
            lags=e.ZSCORE_LAGS,
            threshold=e.ZSCORE_THRESHOLD,
            influence=0.1,
        ),
    )
    timed("alerts", lambda: al.alert_pipeline(e._fs(spark, sf_dir), e.ALERT_CFG))
    timed("ordered_release", lambda: __import__(
        "apmbackend_spark.operators.ordering", fromlist=["ordered_release"]
    ).ordered_release(load_tx(spark, sf_dir)))
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from apmbackend_spark.session import get_spark

    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = f"/tmp/apm_scale_{k}x"
    shutil.rmtree(scaled_dir, ignore_errors=True)
    os.makedirs(scaled_dir, exist_ok=True)
    print(f"tiling events {k}x into {scaled_dir} ...", flush=True)
    tile_events(spark, sf_dir, scaled_dir, k)

    print("timing 1x ...", flush=True)
    base = chain_timings(spark, sf_dir)
    # second 1x pass so the comparison excludes first-plan codegen
    base = chain_timings(spark, sf_dir)
    print(f"timing {k}x ...", flush=True)
    big = chain_timings(spark, scaled_dir)

    print(f"\n{'query':<18}{'1x sec':>10}{k:>9}x sec{'factor':>9}")
    for q in base:
        f = big[q] / base[q] if base[q] else float("inf")
        print(f"{q:<18}{base[q]:>10.2f}{big[q]:>13.2f}{f:>9.1f}")


if __name__ == "__main__":
    main()
