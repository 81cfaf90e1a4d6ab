"""Semi-structured (JSON) column handling over the events stream.

The fixture's ``events.props`` is a JSON string column no reference
operator consumes; a lake engine must still give it schema-on-read. The
Spark-first form is ``from_json`` with an explicit schema — a typed,
codegen'd columnar parse (NOT a per-row Python json.loads): malformed or
missing keys surface as NULLs, which the rollup counts explicitly so data
quality is observable rather than silently dropped.

Scale: stateless per-row parse fused into the scan stage + one map-side
combinable aggregation — embarrassingly parallel, shuffle carries only
|event_type| partial rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROPS_SCHEMA = "k INT"


def props_rollup(events: DataFrame) -> DataFrame:
    """Per event_type profile of the JSON payload: row count, total/distinct
    k, and how many rows had no parseable k (malformed JSON or absent key)."""
    k = F.from_json(F.col("props"), PROPS_SCHEMA).getField("k")
    parsed = events.select(F.col("event_type"), k.alias("k"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("n_unparsed"),
        )
    )


PROPS_ROLLUP_ORACLE = """
WITH parsed AS (
    -- json_valid + json_type + TRY_CAST so a malformed-props row (the very
    -- case the rollup advertises counting) degrades to k NULL like Spark's
    -- strict from_json, instead of aborting the oracle query: only a JSON
    -- integer parses (a quoted "7" or a 5.7 stays NULL, as in Spark's
    -- JacksonParser), and TRY_CAST absorbs out-of-INT-range values
    SELECT event_type,
           CASE WHEN json_valid(props)
                 AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(json_extract(props, '$.k') AS INT)
           END AS k
    FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
       CAST(COUNT(CASE WHEN k IS NULL THEN 1 END) AS BIGINT) AS n_unparsed
FROM parsed
GROUP BY event_type
"""
