"""Slowly-changing-dimension type-2 merge — the lake-maintenance operator a
dimension pipeline runs per snapshot delivery (Kimball SCD2: close the
changed row, open a new version, insert unseen keys, keep history
immutable).

Plan shape: logically one FULL OUTER equi-join on the dimension key between
the current-version slice and the incoming snapshot, then a union of four
disjoint leg projections (history pass-through, closed rows, carried rows,
opened rows). Catalyst specializes the join per leg — the carried leg reads
only the left side so it plans LeftOuter, the closed leg Inner, the opened
leg RightOuter (asserted in tests/test_plans.py) — each a keyed hash join
(sort-merge at dimension scale, broadcast when the delta is small); nothing
is ordered globally and no window functions are involved, so the operator
is shuffle-minimal and embarrassingly scalable: 100 TB dimension history is
fine because only the `is_current` slice joins — history rows stream
straight through.

Change detection is null-safe equality over the tracked attributes
(`eqNullSafe`), so NULL→value and value→NULL transitions version correctly.
Keys present in the dimension but absent from the snapshot are treated as
"no news" (stay current) — full-snapshot deletes would add a close-only leg,
noted here as the documented variant.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(dim: DataFrame, t0: int) -> DataFrame:
    """Initial SCD2 load: every row current from t0, open-ended."""
    return (
        dim.withColumn("valid_from", F.lit(t0).cast("long"))
        .withColumn("valid_to", F.lit(None).cast("long"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_merge(
    scd: DataFrame,
    snapshot: DataFrame,
    key: str,
    attrs: list[str],
    effective_ms: int,
) -> DataFrame:
    """Merge a new snapshot into an SCD2 table at ``effective_ms``.

    ``scd`` columns: key, *attrs, valid_from, valid_to, is_current.
    ``snapshot`` columns: key, *attrs.

    PRECONDITION: ``snapshot`` must be key-unique (one row per ``key``) —
    the standard dimension-delivery contract. A duplicate-keyed delivery
    would fan out through the join and mint multiple current versions;
    validate upstream (e.g. ``assert snap.groupBy(key).count().where("count
    > 1").isEmpty()`` in the ingest job) rather than silently deduping
    here, because which duplicate to keep is a data-owner decision.
    """
    hist = scd.where(~F.col("is_current"))
    cur = scd.where(F.col("is_current")).alias("c")
    snap = snapshot.alias("s")

    joined = cur.join(snap, F.col(f"c.{key}") == F.col(f"s.{key}"), "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"c.{a}").eqNullSafe(F.col(f"s.{a}")) for a in attrs],
    )
    in_cur = F.col(f"c.{key}").isNotNull()
    in_snap = F.col(f"s.{key}").isNotNull()
    changed = in_cur & in_snap & ~same

    # ONE pass over the merge join: each joined row explodes into its 0-2
    # output versions (carry XOR close+open, or open-only for new keys).
    # Filtered per-leg selects would instantiate the full-outer join once
    # PER LEG — three joins and three source scans in every merge plan
    # (Catalyst treats each DataFrame reference as its own subtree and the
    # legs' differing projections defeat exchange reuse).
    def _ver(side, valid_from, valid_to, is_current):
        return F.struct(
            F.col(f"{side}.{key}").alias(key),
            *[F.col(f"{side}.{a}").alias(a) for a in attrs],
            valid_from.cast("long").alias("valid_from"),
            valid_to.cast("long").alias("valid_to"),
            is_current.cast("boolean").alias("is_current"),
        )

    # leg 1: current rows with no news (absent from snapshot) or unchanged
    carried = _ver(
        "c", F.col("c.valid_from"), F.col("c.valid_to"), F.col("c.is_current")
    )
    # leg 2: changed rows -> close the old version at effective_ms
    closed = _ver(
        "c", F.col("c.valid_from"), F.lit(effective_ms), F.lit(False)
    )
    # leg 3: changed or brand-new keys -> open a version at effective_ms
    opened = _ver("s", F.lit(effective_ms), F.lit(None), F.lit(True))
    versions = (
        joined.select(
            F.explode(
                F.array(
                    F.when(in_cur & (~in_snap | same), carried),
                    F.when(changed, closed),
                    F.when(changed | (in_snap & ~in_cur), opened),
                )
            ).alias("__v")
        )
        .where(F.col("__v").isNotNull())
        .select("__v.*")
    )
    return hist.unionByName(versions)


# ---------------------------------------------------------------------------
# Graded composition over the customer dimension: initial load at T0, one
# deterministic "day-2" snapshot merged at T1. The snapshot rule (shared
# verbatim by the oracle): customers with custkey%7==0 churn segment and
# shift balance by (custkey%100); custkey%11==0 are missing from the
# delivery (stay current); custkey%13==0 spawn a new customer at
# key+10_000_000.
# ---------------------------------------------------------------------------

SCD2_T0 = 0
SCD2_T1 = 86_400_000
SCD2_ATTRS = ["c_mktsegment", "c_acctbal"]


def _customer_snapshot(customer: DataFrame) -> DataFrame:
    churn = F.col("c_custkey") % 7 == 0
    base = customer.where(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        F.when(churn, F.lit("CHURNED")).otherwise(F.col("c_mktsegment")).alias(
            "c_mktsegment"
        ),
        F.when(
            churn, F.col("c_acctbal") + (F.col("c_custkey") % 100).cast("double")
        )
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    )
    new = customer.where(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + F.lit(10_000_000)).alias("c_custkey"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        (F.col("c_custkey") % 1000).cast("double").alias("c_acctbal"),
    )
    return base.unionByName(new)


def scd2_customer(customer: DataFrame) -> DataFrame:
    scd = scd2_init(
        customer.select("c_custkey", *SCD2_ATTRS), SCD2_T0
    )
    return scd2_merge(
        scd, _customer_snapshot(customer), "c_custkey", SCD2_ATTRS, SCD2_T1
    )


def scd2_customer_oracle_sql() -> str:
    return f"""
WITH cur AS (
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST({SCD2_T0} AS BIGINT) AS valid_from,
           CAST(NULL AS BIGINT) AS valid_to,
           TRUE AS is_current
    FROM customer
),
snap AS (
    SELECT c_custkey,
           CASE WHEN c_custkey % 7 = 0 THEN 'CHURNED' ELSE c_mktsegment END
               AS c_mktsegment,
           CASE WHEN c_custkey % 7 = 0
                THEN c_acctbal + CAST(c_custkey % 100 AS DOUBLE)
                ELSE c_acctbal END AS c_acctbal
    FROM customer WHERE c_custkey % 11 <> 0
    UNION ALL
    SELECT c_custkey + 10000000, 'NEWSEG', CAST(c_custkey % 1000 AS DOUBLE)
    FROM customer WHERE c_custkey % 13 = 0
),
j AS (
    SELECT c.c_custkey AS ck, s.c_custkey AS sk,
           c.c_mktsegment AS cm, c.c_acctbal AS cb,
           s.c_mktsegment AS sm, s.c_acctbal AS sb,
           c.valid_from AS vf,
           (c.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
            AND NOT (c.c_mktsegment IS NOT DISTINCT FROM s.c_mktsegment
                     AND c.c_acctbal IS NOT DISTINCT FROM s.c_acctbal))
               AS changed
    FROM cur c FULL OUTER JOIN snap s ON c.c_custkey = s.c_custkey
)
SELECT ck AS c_custkey, cm AS c_mktsegment, cb AS c_acctbal,
       vf AS valid_from, CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
FROM j WHERE ck IS NOT NULL AND (sk IS NULL OR NOT changed)
UNION ALL
SELECT ck, cm, cb, vf, CAST({SCD2_T1} AS BIGINT), FALSE
FROM j WHERE changed
UNION ALL
SELECT sk, sm, sb, CAST({SCD2_T1} AS BIGINT), CAST(NULL AS BIGINT), TRUE
FROM j WHERE changed OR (sk IS NOT NULL AND ck IS NULL)
"""
