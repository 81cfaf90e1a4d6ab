"""Batch parquet loaders for the driver test tables.

All timestamps are also exposed as epoch-millis longs so query outputs are
engine-portable (a raw TIMESTAMP column hashes differently across engines;
a BIGINT does not).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (mirrors the driver's DuckDB
    side, which pre-registers the same names)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
