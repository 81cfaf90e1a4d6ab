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


# Canonical type names so a DuckDB HUGEINT (SUM of BIGINT) is flagged against
# a Spark LongType even though fetchall() yields equal Python ints — the
# driver's value-hasher is type-sensitive (CORRECTNESS_r01: media_stats/q1).
_SPARK_CANON = {
    "tinyint": "i8",
    "smallint": "i16",
    "int": "i32",
    "integer": "i32",
    "bigint": "i64",
    "long": "i64",
    "float": "f32",
    "double": "f64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts_ntz",
    "binary": "bytes",
}
_DUCK_CANON = {
    "TINYINT": "i8",
    "SMALLINT": "i16",
    "INTEGER": "i32",
    "BIGINT": "i64",
    "HUGEINT": "i128",
    "UTINYINT": "u8",
    "USMALLINT": "u16",
    "UINTEGER": "u32",
    "UBIGINT": "u64",
    "FLOAT": "f32",
    "DOUBLE": "f64",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "BLOB": "bytes",
}


def type_mismatches(sdf, dres) -> list[str]:
    """Column-level canonical-type diffs between a Spark DataFrame and a
    DuckDB relation (sorted-by-name alignment, like the driver's hasher)."""
    stypes = {f.name.lower(): _SPARK_CANON.get(f.dataType.simpleString(), f.dataType.simpleString()) for f in sdf.schema.fields}
    dtypes = {c.lower(): _DUCK_CANON.get(str(t), str(t)) for c, t in zip(dres.columns, dres.types)}
    diffs = []
    for col in sorted(set(stypes) & set(dtypes)):
        if stypes[col] != dtypes[col]:
            diffs.append(f"{col}: spark={stypes[col]} duck={dtypes[col]}")
    return diffs


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
    tdiffs = type_mismatches(sdf, dres)
    if tdiffs:
        return False, f"type mismatch (driver hash would fail): {tdiffs}"
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
