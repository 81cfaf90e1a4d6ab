"""Simulate the driver: vanilla SparkSession (no builder confs), run every
queries() entry and report row counts. Usage: python scripts/vanilla_check.py [sf_dir]."""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[8]")
    .appName("vanilla-driver-sim")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

failures = []
for name, fn in e.queries().items():
    try:
        n = fn(spark, sf_dir).count()
        print(f"OK   {name}: {n} rows")
    except Exception:
        failures.append(name)
        print(f"FAIL {name}")
        traceback.print_exc(limit=3)

print(f"\n{len(failures)} failures: {failures}")
sys.exit(1 if failures else 0)
