"""JSON-lines ingest with malformed-record accounting — the schema-on-read
source contract a lake engine owes semi-structured deliveries.

Spark-first shape: ``spark.read.schema(...).json`` in PERMISSIVE mode with a
declared ``_corrupt_record`` column — the JVM-side Jackson parse (typed,
fused into the scan; NOT per-row Python) degrades malformed lines to NULL
fields + the raw line in the corrupt column, so data quality is an
aggregatable observable rather than a job abort (DROPMALFORMED) or a
poison-pill (FAILFAST).

The graded gate round-trips the documents table through real JSONL files:
rows are serialized executor-side (one JSON object per line), a
deterministic subset (doc_id % 13 == 0) is truncated mid-object to simulate
a torn delivery, the directory is read back through the PERMISSIVE path,
and a per-lang rollup counts survivors vs corrupt lines. The DuckDB oracle
computes the same rollup straight from the table — parity proves both the
serializer and the corrupt-record accounting.

Scale: the writer is an embarrassingly-parallel mapInPandas (lines never
visit the driver); the reader is a plain distributed text/JSON scan whose
parse is per-line local. Nothing shuffles until the |langs|-row rollup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_EVERY = 13  # doc_id % CORRUPT_EVERY == 0 lines are torn

JSONL_SCHEMA = (
    "doc_id long, lang string, source string, n_chars long, "
    "_corrupt_record string"
)


def write_jsonl(documents: DataFrame, out_dir: str) -> None:
    """Serialize (doc_id, lang, source, n_chars) to JSONL executor-side,
    tearing every ``doc_id % 13 == 0`` line mid-object."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        for pdf in batches:
            lines = []
            for r in pdf.itertuples(index=False):
                line = json.dumps(
                    {
                        "doc_id": int(r.doc_id),
                        "lang": r.lang,
                        "source": r.source,
                        "n_chars": int(r.n_chars),
                    },
                    separators=(",", ":"),
                )
                if r.doc_id % CORRUPT_EVERY == 0:
                    line = line[: len(line) - 5]  # unterminated object
                lines.append(line)
            yield pd.DataFrame({"value": lines})

    (
        documents.select("doc_id", "lang", "source", "n_chars")
        .mapInPandas(fn, schema="value string")
        .write.mode("overwrite")
        .text(out_dir)
    )


def read_jsonl(spark: SparkSession, in_dir: str) -> DataFrame:
    """PERMISSIVE schema-on-read: malformed lines surface as NULL fields
    plus the raw line in ``_corrupt_record``."""
    return (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(in_dir)
    )


def jsonl_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip gate: documents -> torn JSONL delivery -> PERMISSIVE read
    -> per-lang quality rollup (corrupt lines land in the lang=NULL row)."""
    import atexit
    import os
    import shutil
    import tempfile

    from apmbackend_spark.sources.loaders import load_table

    work = tempfile.mkdtemp(prefix="apm_jsonl_gate_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    out = os.path.join(work, "delivery")
    docs = load_table(spark, sf_dir, "documents")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sum_chars"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
    )


def jsonl_ingest_oracle_sql() -> str:
    return f"""
WITH parsed AS (
    SELECT CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL ELSE lang END
               AS lang,
           CASE WHEN doc_id % {CORRUPT_EVERY} = 0 THEN NULL ELSE n_chars END
               AS n_chars,
           (doc_id % {CORRUPT_EVERY} = 0) AS is_corrupt
    FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(COUNT(CASE WHEN is_corrupt THEN 1 END) AS BIGINT) AS n_corrupt
FROM parsed
GROUP BY lang
"""
