"""Local replica of the driver's correctness gate (DuckDB differential
oracle): shared by scripts/check_oracle.py and the pytest suite."""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def duckdb_connect(sf_dir: str):
    import duckdb

    from apmbackend_spark.sources.loaders import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(rows, colnames):
    """Sort columns by name and rows by value — order-insensitive compare."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append(None)
            else:
                vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return out


def compare_query(
    spark: SparkSession, sf_dir: str, query_fn, oracle: str | None
) -> tuple[bool, str]:
    """Returns (ok, message). Exact value equality — the engine is designed
    for bit-deterministic floats, so no tolerance is used."""
    sdf = query_fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if oracle is None:
        return len(srows) >= 0, f"rows-only: {len(srows)} rows"
    con = duckdb_connect(sf_dir)
    dres = con.sql(oracle)
    drows = dres.fetchall()
    dcols = [c.lower() for c in dres.columns]
    if sorted(scols) != sorted(dcols):
        return False, f"schema mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"rowcount mismatch: spark={len(srows)} duck={len(drows)}"
    cs = _canon(srows, scols)
    cd = _canon(drows, dcols)
    mismatches = [(a, b) for a, b in zip(cs, cd) if a != b]
    if mismatches:
        a, b = mismatches[0]
        return (
            False,
            f"{len(mismatches)}/{len(cs)} value mismatches; first: spark={a} duck={b}",
        )
    return True, f"OK ({len(srows)} rows)"
