"""Change-data-capture snapshot diff (table-state reconciliation).

A lakehouse ingest that lands full snapshots (the reference's Postgres
tables are exactly this shape — ``db_insert.js`` re-materializes whole
derived tables per cycle) needs a diff between consecutive snapshots to
publish a changelog: which keys appeared, vanished, or changed, and what
the old/new values are. This is the batch complement of the SCD2 operator
(``scd.py``) — SCD2 folds history into validity ranges; CDC emits the
per-cycle delta a downstream consumer (cache invalidation, incremental
index, audit feed) actually applies.

Plan shape: ONE full-outer hash join on the key — both snapshot scans
prune to key + compared columns, the changed-row predicate and the
insert/delete/update classification are pure codegen (null-safe
comparisons, no UDF, no second pass). At 100 TB both snapshots live
bucketed on the key (see ``bucketing.py``), which turns the diff into a
zero-exchange sort-merge join per bucket pair; unbucketed, it is a single
shuffle of each side — never more.

Determinism: every output value is either a passthrough or an IS DISTINCT
FROM comparison — no float arithmetic is introduced, so the diff is
bit-exact across engines by construction.

The gate derives the two snapshots from ``orders`` deterministically
(drop-mod-13 for the old state, drop-mod-11 + price/status mutations for
the new) so all three op classes and the both-absent edge are exercised
from the fixture.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deterministic snapshot derivation (mirrored in the oracle SQL).
OLD_DROP_MOD = 13  # keys missing from the old snapshot -> 'insert'
NEW_DROP_MOD = 11  # keys missing from the new snapshot -> 'delete'
PRICE_BUMP_MOD = 5  # keys whose price moves between snapshots
STATUS_FLIP_MOD = 17  # keys whose status flips to 'X'


def cdc_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Generic snapshot diff: one row per inserted / deleted / changed key.

    Output: the key, ``op`` ('insert' | 'delete' | 'update'), and an
    ``<col>_old`` / ``<col>_new`` pair per compared column (NULL on the
    absent side). Unchanged keys are dropped by a null-safe any-column
    predicate, so the result is exactly the changelog.
    """
    o = old.select(
        F.col(key).alias("__ok"),
        *[F.col(c).alias(f"{c}_old") for c in compare_cols],
    )
    n = new.select(
        F.col(key).alias("__nk"),
        *[F.col(c).alias(f"{c}_new") for c in compare_cols],
    )
    j = o.join(n, o["__ok"] == n["__nk"], "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        # IS DISTINCT FROM: null-safe inequality, pure codegen.
        changed = changed | ~F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    op = (
        F.when(F.col("__ok").isNull(), F.lit("insert"))
        .when(F.col("__nk").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    pairs = [x for c in compare_cols for x in (f"{c}_old", f"{c}_new")]
    return (
        j.where(F.col("__ok").isNull() | F.col("__nk").isNull() | changed)
        .select(
            F.coalesce(F.col("__ok"), F.col("__nk")).alias(key),
            op.alias("op"),
            *pairs,
        )
    )


def _old_snapshot(orders: DataFrame) -> DataFrame:
    return orders.where(F.col("o_orderkey") % OLD_DROP_MOD != 0)


def _new_snapshot(orders: DataFrame) -> DataFrame:
    key = F.col("o_orderkey")
    return orders.where(key % NEW_DROP_MOD != 0).select(
        "o_orderkey",
        "o_custkey",
        # +1..+7 integer bump: exact in IEEE doubles, never zero, so every
        # bumped key really is an update in both engines.
        F.when(
            key % PRICE_BUMP_MOD == 0,
            F.col("o_totalprice") + (key % 7 + F.lit(1)).cast("double"),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(key % STATUS_FLIP_MOD == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )


def cdc_orders(orders: DataFrame) -> DataFrame:
    """The graded wiring: diff the two derived order snapshots on
    (o_totalprice, o_orderstatus)."""
    return cdc_diff(
        _old_snapshot(orders),
        _new_snapshot(orders),
        "o_orderkey",
        ("o_totalprice", "o_orderstatus"),
    )


def cdc_orders_oracle_sql() -> str:
    return f"""
WITH old_snap AS (
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey % {OLD_DROP_MOD} <> 0
),
new_snap AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % {PRICE_BUMP_MOD} = 0
                THEN o_totalprice
                     + CAST(o_orderkey % 7 + 1 AS DOUBLE)
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % {STATUS_FLIP_MOD} = 0 THEN 'X'
                ELSE o_orderstatus END AS o_orderstatus
    FROM orders WHERE o_orderkey % {NEW_DROP_MOD} <> 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS op,
       o.o_totalprice AS o_totalprice_old,
       n.o_totalprice AS o_totalprice_new,
       o.o_orderstatus AS o_orderstatus_old,
       n.o_orderstatus AS o_orderstatus_new
FROM old_snap o
FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
"""


# ---------------------------------------------------------------------------
# Incremental materialized-aggregate maintenance: apply the changelog to a
# base rollup instead of rescanning the fact table.
# ---------------------------------------------------------------------------

def _order_cents(col: str) -> F.Column:
    # engine-wide fixed-point rule: exact integer cents, order-free sums
    return F.floor(F.col(col) * F.lit(100.0) + F.lit(0.5)).cast("long")


def rollup_incremental(orders: DataFrame) -> DataFrame:
    """Maintain the per-customer (n_orders, total_cents) rollup across a
    snapshot transition INCREMENTALLY: base aggregate over the old
    snapshot, plus a signed delta computed from the *changed keys only*
    (insert -> +new, delete -> -old, update -> new-old), merged by one
    union + re-aggregate. The oracle recomputes the same rollup directly
    from the new snapshot — so the gate IS the differential proof that
    changelog application equals full recomputation.

    Scale shape: this is the materialized-view pattern a 100 TB lake needs
    — the base rollup is a stored table, and per cycle only the delta
    (changelog-sized, here derived in-plan via the cdc full-outer join)
    shuffles; nothing rescans history. All quantities are exact integer
    counts/cents, so the merge is order-free and bit-deterministic.
    """
    old = _old_snapshot(orders).select(
        "o_orderkey", "o_custkey", _order_cents("o_totalprice").alias("c")
    )
    new = _new_snapshot(orders).select(
        "o_orderkey", "o_custkey", _order_cents("o_totalprice").alias("c")
    )
    base = old.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"), F.sum("c").alias("total_cents")
    )
    o = old.select(
        F.col("o_orderkey").alias("__ok"),
        F.col("o_custkey").alias("ck_o"),
        F.col("c").alias("c_o"),
    )
    n = new.select(
        F.col("o_orderkey").alias("__nk"),
        F.col("o_custkey").alias("ck_n"),
        F.col("c").alias("c_n"),
    )
    changed = (
        F.col("__ok").isNull()
        | F.col("__nk").isNull()
        | ~F.col("c_o").eqNullSafe(F.col("c_n"))
    )
    delta = (
        o.join(n, o["__ok"] == n["__nk"], "full_outer")
        .where(changed)
        .select(
            F.coalesce(F.col("ck_o"), F.col("ck_n")).alias("o_custkey"),
            (
                F.when(F.col("__nk").isNotNull(), 1)
                .otherwise(0)
                - F.when(F.col("__ok").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_orders"),
            (
                F.coalesce(F.col("c_n"), F.lit(0).cast("long"))
                - F.coalesce(F.col("c_o"), F.lit(0).cast("long"))
            ).alias("total_cents"),
        )
    )
    return (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_cents").alias("total_cents"),
        )
        .where(F.col("n_orders") > 0)
        .select(
            "o_custkey",
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("total_cents").cast("long").alias("total_cents"),
        )
    )


def rollup_incremental_oracle_sql() -> str:
    # Direct recomputation over the new snapshot — deliberately NOT the
    # incremental path, so the gate proves base+delta == recompute.
    return f"""
WITH new_snap AS (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % {PRICE_BUMP_MOD} = 0
                THEN o_totalprice
                     + CAST(o_orderkey % 7 + 1 AS DOUBLE)
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % {NEW_DROP_MOD} <> 0
)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents
FROM new_snap
GROUP BY o_custkey
"""
