"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec", "queries":
{name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). A warmup pass (the flagship window-stats chain plus the
first registered query) absorbs JVM/codegen start-up so numbers reflect
steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline subset: run every registered query unless it is in SKIP.
SKIP: set[str] = set()


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as e
    from apmbackend_spark.session import get_spark

    spark = get_spark("bench")
    queries = {k: v for k, v in e.queries().items() if k not in SKIP}

    # Warmup: absorb session/codegen startup cost with the flagship
    # window-stats chain (the plan family shared by the heaviest queries)
    # plus the first registered query (a documents-table scan).
    force(queries["window_stats"](spark, SF_DIR))
    force(next(iter(queries.values()))(spark, SF_DIR))
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        force(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
        # Isolation between timings: multi-pass operators persist
        # intermediates that are garbage once the query's action completes;
        # left in place they pin unified memory and make later queries spill
        # (a leaked-cache artifact, not real cost — mirrors the driver's
        # fresh-process-per-query gate).
        spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "apmbackend_spark bench: wall seconds per headline query",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
