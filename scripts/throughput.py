"""Streaming throughput probe: drain the full event fixture through the
watermarked window-stats stream (tx projection -> watermark -> sliding-window
agg -> memory sink) and report events/s.

Context for the number: the reference's operational envelope is ~70 tailed
files feeding single-threaded Node stages with a steady derived-stat output
of ~76 rec/s (BASELINE.md); this probe pushes the same dataflow through one
Structured Streaming query.

Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/throughput.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from apmbackend_spark.session import get_spark
    from apmbackend_spark.streaming.pipeline import (
        run_available_now,
        tx_stream,
        window_stats_stream,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("throughput")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    with tempfile.TemporaryDirectory() as ckpt:
        t0 = time.perf_counter()
        out = run_available_now(
            window_stats_stream(tx_stream(spark, sf_dir)),
            f"{ckpt}/ws",
            query_name="throughput_ws",
        )
        n_stats = out.count()
        secs = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "streaming events/s through watermarked window-stats",
                "events_in": n_events,
                "stat_rows_out": n_stats,
                "seconds": round(secs, 3),
                "events_per_sec": round(n_events / secs, 1),
                "stat_rows_per_sec": round(n_stats / secs, 1),
                "reference_steady_output_rec_per_sec": 76,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
