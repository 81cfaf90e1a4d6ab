"""General relational coverage on the TPC-H-ish star schema — the joins,
grouped aggregations, and top-k orderings the reference never exposes
(SURVEY.md §2.9: "come free from Spark") but a complete engine must have.

Plan hygiene (checked by tests/test_plans.py):
  * dimension joins (region, nation, customer-at-sf) broadcast;
    fact-fact joins (orders x lineitem) are shuffled hash/sort-merge on the
    key — never nested-loop
  * filters and column pruning reach the parquet scan (PushedFilters /
    ReadSchema)
  * aggregates are map-side partial before the exchange

Float determinism: money sums are integer-ized (cents / 1e-4 units) before
SUM so results are bit-identical across engines; see sources/tx.py for the
rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apmbackend_spark.sources.loaders import load_table

CUTOFF = "1999-12-31 00:00:00"
Q3_CUTOFF = "1998-01-01 00:00:00"


def _cents(col, scale=100):
    return F.round(col * F.lit(scale), 0).cast("long")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem (scan + filter +
    map-side-combinable aggregation; no joins, no arrays)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    agg = (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
            _cents(F.col("l_extendedprice")).alias("base_c"),
            _cents(disc_price, 10_000).alias("disc_c"),
            _cents(charge, 10_000).alias("charge_c"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").alias("sum_qty"),
            (F.sum("base_c").cast("double") / 100.0).alias("sum_base_price"),
            (F.sum("disc_c").cast("double") / 10_000.0).alias("sum_disc_price"),
            (F.sum("charge_c").cast("double") / 10_000.0).alias("sum_charge"),
            (F.sum("qty").cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (
                F.sum("base_c").cast("double") / F.count(F.lit(1)) / 100.0
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg


Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS BIGINT) AS sum_qty,
       CAST(SUM(base_c) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM(disc_c) AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(SUM(charge_c) AS DOUBLE) / 10000.0 AS sum_charge,
       CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(base_c) AS DOUBLE) / COUNT(*) / 100.0 AS avg_price,
       COUNT(*) AS count_order
FROM (
    SELECT l_returnflag, l_linestatus,
           CAST(l_quantity AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS base_c,
           CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000, 0) AS BIGINT) AS disc_c,
           CAST(round((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) * 10000, 0) AS BIGINT) AS charge_c
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
)
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q3-shaped: top-k open orders by discounted revenue for one
    market segment. customer is broadcast; orders x lineitem sort-merge."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp")
    )
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 10_000)
    joined = (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(F.broadcast(cust.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "l_orderkey",
            # cast-to-TIMESTAMP is a no-op on TimestampType and rescues a
            # session that inferred the parquet ms column as TIMESTAMP_NTZ
            # (UTC session => identical epoch math either way).
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_ms"
            ),
            "o_orderpriority",
            rev.alias("rev_c"),
        )
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate_ms", "o_orderpriority").agg(
        (F.sum("rev_c").cast("double") / 10_000.0).alias("revenue")
    )
    # Top-k via orderBy+limit => TakeOrderedAndProject: every partition
    # yields its local top-k, the driver merges k*#parts candidate rows. A
    # global row_number window here would instead funnel the WHOLE aggregate
    # through one task; the ranking window below only ever sees k rows.
    topk = agg.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(k)
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("l_orderkey", "o_orderdate_ms", "o_orderpriority", "revenue", "rank")
    )


Q3_ORACLE = f"""
WITH joined AS (
    SELECT l.l_orderkey,
           epoch_ms(o.o_orderdate) AS o_orderdate_ms,
           o.o_orderpriority,
           CAST(round((l.l_extendedprice * (1.0 - l.l_discount)) * 10000, 0) AS BIGINT) AS rev_c
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
      AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
), agg AS (
    SELECT l_orderkey, o_orderdate_ms, o_orderpriority,
           CAST(SUM(rev_c) AS DOUBLE) / 10000.0 AS revenue
    FROM joined GROUP BY 1, 2, 3
)
SELECT l_orderkey, o_orderdate_ms, o_orderpriority, revenue,
       CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS INT) AS rank
FROM agg
QUALIFY rank <= 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation where customer and supplier share
    the nation, one region, one year. region/nation/supplier broadcast."""
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    rev = _cents(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 10_000)
    nations_in_region = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(
            cust,
            (orders["o_custkey"] == cust["c_custkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(
            F.broadcast(nations_in_region),
            cust["c_nationkey"] == nations_in_region["n_nationkey"],
        )
    )
    return (
        joined.select("n_name", rev.alias("rev_c"))
        .groupBy("n_name")
        .agg((F.sum("rev_c").cast("double") / 10_000.0).alias("revenue"))
    )


Q5_ORACLE = """
SELECT n.n_name,
       CAST(SUM(CAST(round((l.l_extendedprice * (1.0 - l.l_discount)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""


Q6_YEAR_START = "1997-01-01 00:00:00"
Q6_YEAR_END = "1998-01-01 00:00:00"


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: revenue effect of discount changes — one scan, zero
    joins, zero shuffles beyond the final single-group agg. Every predicate
    (shipdate range, discount band, quantity cap) and the 3-column
    projection must reach the parquet scan as PushedFilters/ReadSchema
    (asserted in tests/test_plans.py) — at 100 TB this query IS its scan."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q6_YEAR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q6_YEAR_END).cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = _cents(F.col("l_extendedprice") * F.col("l_discount"), 10_000)
    return li.select(rev.alias("rev_c")).agg(
        (F.sum("rev_c").cast("double") / 10_000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q6_ORACLE = f"""
SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR_START}'
  AND l_shipdate < TIMESTAMP '{Q6_YEAR_END}'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


Q4_QTR_START = "1997-01-01 00:00:00"
Q4_QTR_END = "1997-04-01 00:00:00"


def q4_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: order count per priority for orders with at least
    one late-shipped lineitem (l_shipdate > o_orderdate) — an EXISTS
    semi-join. LeftSemi keeps orders' columns only, so lineitem never
    widens the row: the shuffle carries (l_orderkey, l_shipdate) alone.

    The fixture has no l_commitdate/l_receiptdate, so "late" is defined
    against o_orderdate — same join/predicate shape as the published Q4."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q4_QTR_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_QTR_END).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_QTR_START}'
  AND o.o_orderdate < TIMESTAMP '{Q4_QTR_END}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
"""


def parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join coverage: parts with no lineitem in a ship-date window,
    counted per brand. part LEFT ANTI lineitem-keys — the NOT EXISTS shape.
    The distinct on l_partkey happens BEFORE the join (map-side combinable),
    so the anti-join probe side is |distinct parts shipped|, not |lineitem|."""
    part = load_table(spark, sf_dir, "part")
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(Q6_YEAR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q6_YEAR_END).cast("timestamp"))
        )
        .select("l_partkey")
        .distinct()
    )
    anti = part.join(shipped, part["p_partkey"] == shipped["l_partkey"], "left_anti")
    return anti.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.sum(_cents(F.col("p_retailprice"))).cast("double") / 100.0).alias(
            "idle_retail_value"
        ),
    )


PARTS_NEVER_SHIPPED_ORACLE = f"""
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0 AS idle_retail_value
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_partkey = p.p_partkey
      AND l.l_shipdate >= TIMESTAMP '{Q6_YEAR_START}'
      AND l.l_shipdate < TIMESTAMP '{Q6_YEAR_END}'
)
GROUP BY p_brand
"""


def q18_large_volume_customers(
    spark: SparkSession, sf_dir: str, qty_threshold: int = 250
) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total lineitem quantity exceeds the
    threshold, joined back to their customer — the aggregation-driven
    semi-join shape (HAVING subquery drives the join).

    Scale shape: the ONLY full-fact pass is one map-side-combinable groupBy
    on l_orderkey (partial sums per mapper, one shuffle). Its survivors are
    a tiny set under any selective threshold, so they BROADCAST into the
    orders join — the big fact is probed once, never shuffled on the join
    key — and the (few) hits then join customer hash-to-hash; AQE converts
    that to broadcast too when the hit set is small enough."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > int(qty_threshold))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    hits = orders.join(
        F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"]
    )
    return (
        hits.join(cust, hits["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_ms"
            ),
            _cents(F.col("o_totalprice"), 100).alias("totalprice_c"),
            "sum_qty",
        )
    )


def q18_oracle_sql(qty_threshold: int = 250) -> str:
    """Oracle twin of q18_large_volume_customers; keep the threshold default
    in lockstep with the function's."""
    return f"""
WITH big AS (
    SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(l_quantity) > {int(qty_threshold)}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       epoch_ms(o.o_orderdate) AS o_orderdate_ms,
       CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS totalprice_c,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


Q18_ORACLE = q18_oracle_sql()


# ---------------------------------------------------------------------------
# Runtime Bloom-filter join (row-level runtime pruning, the DPP sibling)
# ---------------------------------------------------------------------------

BLOOM_PRIORITY = "1-URGENT"


def bloom_join_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side rollup of `lineitem JOIN orders` where orders carries a
    selective dim-attribute filter: Catalyst's RUNTIME BLOOM FILTER
    injects a `bloom_filter_agg` subquery on the filtered build side and a
    `might_contain(xxhash64(l_orderkey))` predicate into the fact scan —
    row-level runtime pruning, the shuffle-join sibling of dynamic
    partition pruning (asserted in tests/test_plans.py). At 100 TB the
    fact rows that would shuffle only to be dropped by the join are
    instead filtered at the scan for the cost of one broadcast bitmap.

    The two conf overrides exist because the feature is sized for real
    lakes: the application-side scan threshold defaults to 10 GB (the
    fixture is far smaller — at production volume the default stands), and
    broadcast is disabled so the join actually shuffles (a broadcast join
    already prunes build-side misses by construction). Both are
    runtime-settable and restored.

    Semantics are untouched by the optimization — the oracle is the plain
    join."""
    from apmbackend_spark.sources.loaders import load_table

    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == BLOOM_PRIORITY
        )
        out = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            )
        )
        # a Dataset's QueryExecution plans lazily ONCE — forcing the
        # physical plan inside the conf scope pins the runtime-filter
        # rewrite for every later action on the returned frame
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


BLOOM_JOIN_PROFILE_ORACLE = f"""
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '{BLOOM_PRIORITY}'
GROUP BY l.l_returnflag
"""


# ---------------------------------------------------------------------------
# Q7-shaped: volume shipping between two nations
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_18"
Q7_NATION_B = "NATION_19"


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: shipped revenue between two trading nations, both
    directions, per ship year — supplier nation ≠ customer nation, the
    (A→B, B→A) pair filter.

    Plan shape: nation is a broadcast dim applied TWICE (suppliers and
    customers get independent broadcast joins, each pre-filtered to the
    two nations — the filter prunes before either join, so the fact
    shuffle carries only trading-pair rows); lineitem→orders is the one
    sort-merge join; the year grouping is a codegen date_part. Revenue is
    integer-cents summed exactly.
    """
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "l_extendedprice",
        "l_discount",
    )
    rev = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 10_000
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            rev.alias("rev_c"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (F.sum("rev_c").cast("double") / 10_000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q7_ORACLE = f"""
SELECT s_nat AS supp_nation, c_nat AS cust_nation, l_year,
       CAST(SUM(rev_c) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM (
    SELECT ns.n_name AS s_nat, nc.n_name AS c_nat,
           CAST(date_part('year', l.l_shipdate) AS INT) AS l_year,
           CAST(round((l.l_extendedprice * (1.0 - l.l_discount)) * 10000, 0) AS BIGINT) AS rev_c
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
      AND nc.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
      AND ns.n_name <> nc.n_name
)
GROUP BY s_nat, c_nat, l_year
"""


# ---------------------------------------------------------------------------
# Q14-shaped: promotion revenue share
# ---------------------------------------------------------------------------

Q14_MONTH_START = "1997-03-01 00:00:00"
Q14_MONTH_END = "1997-04-01 00:00:00"


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: share of one month's revenue from PROMO parts —
    a conditional aggregate over one broadcast-joined scan (part is the
    dim). Both the promo numerator and the total ride ONE pass; the
    month predicate reaches the lineitem scan. The percentage is two
    exact integer-cent sums into one division."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q14_MONTH_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q14_MONTH_END).cast("timestamp"))
    )
    rev = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 10_000
    )
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    agg = joined.select(
        rev.alias("rev_c"),
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)).alias(
            "promo_c"
        ),
    ).agg(
        F.sum("promo_c").alias("promo_c"),
        F.sum("rev_c").alias("total_c"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return agg.select(
        (
            F.lit(100.0)
            * (F.col("promo_c").cast("double") / F.col("total_c").cast("double"))
        ).alias("promo_pct"),
        (F.col("total_c").cast("double") / 10_000.0).alias("total_revenue"),
        "n_items",
    )


Q14_ORACLE = f"""
SELECT 100.0 * (CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN rev_c ELSE 0 END) AS DOUBLE)
                / CAST(SUM(rev_c) AS DOUBLE)) AS promo_pct,
       CAST(SUM(rev_c) AS DOUBLE) / 10000.0 AS total_revenue,
       COUNT(*) AS n_items
FROM (
    SELECT l_partkey,
           CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000, 0) AS BIGINT) AS rev_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q14_MONTH_START}'
      AND l_shipdate < TIMESTAMP '{Q14_MONTH_END}'
) l2
JOIN part p ON l2.l_partkey = p.p_partkey
"""


# ---------------------------------------------------------------------------
# Q19-shaped: discounted revenue for bracketed brand/size/quantity bands
# ---------------------------------------------------------------------------


def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue from three disjunctive (brand, size band,
    quantity band) predicates — the classic OR-of-ANDs that must become
    ONE broadcast hash join with the disjunction evaluated as a codegen
    filter after the join, NOT three scans unioned. (The fixture lacks
    l_shipmode/l_shipinstruct; the published shape's per-branch brand +
    p_size range + l_quantity range survives unchanged.)"""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 10_000
    )
    return (
        j.where(band)
        .select(rev.alias("rev_c"))
        .agg(
            (F.sum("rev_c").cast("double") / 10_000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q19_ORACLE = """
SELECT CAST(SUM(CAST(round((l.l_extendedprice * (1.0 - l.l_discount)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q13-shaped: customer distribution by order count
# ---------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: how many customers placed exactly N orders —
    including N=0, the part a naive inner-join rollup silently drops.

    Two aggregates around one LEFT OUTER join: per-customer order count
    (counting o_orderkey so unmatched customers count 0, the COUNT(col)
    null rule), then the distribution rollup. Both shuffles shrink the
    data (customers, then |distinct counts| rows); the join is
    sort-merge on the natural key. The published Q13 filters comments —
    the fixture has none, so the shape is the unfiltered distribution."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q10-shaped: returned-item revenue ranking (top lossy customers)
# ---------------------------------------------------------------------------

Q10_QTR_START = "1997-01-01 00:00:00"
Q10_QTR_END = "1997-04-01 00:00:00"
Q10_TOP = 20


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: revenue lost to RETURNED items (l_returnflag =
    'R') for orders placed in one quarter, per customer with their
    nation, top 20 by lost revenue.

    Plan shape: the quarter predicate prunes the ORDERS scan before the
    lineitem join (orders is the smaller fact — it broadcasts after the
    filter at fixture scale and stays the build side at any scale);
    nation broadcasts onto the customer dim; the per-customer rollup is
    one combinable integer-cent sum; the top-20 is a window over the
    already-aggregated customer frame. Ties break on c_custkey."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(Q10_QTR_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q10_QTR_END).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 10_000
    )
    per_cust = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(rev).alias("rev_c"), F.count(F.lit(1)).alias("n_items"))
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    joined = per_cust.join(
        cust, per_cust["o_custkey"] == cust["c_custkey"]
    ).join(
        F.broadcast(nat),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    # top-k via orderBy+limit => TakeOrderedAndProject (per-partition local
    # top-k, driver merges k*#parts rows); the ranking window then only
    # ever sees k rows — the Q3 pattern, never a global unpartitioned
    # window over all customers.
    topk = joined.orderBy(F.desc("rev_c"), F.asc("c_custkey")).limit(Q10_TOP)
    w = Window.orderBy(F.desc("rev_c"), F.asc("c_custkey"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            (F.col("rev_c").cast("double") / 10_000.0).alias("lost_revenue"),
            F.col("n_items").cast("long").alias("n_items"),
        )
    )


Q10_ORACLE = f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev_c DESC, c_custkey ASC) AS INT) AS rank,
       c_custkey, c_name, nation, lost_revenue, n_items
FROM (
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(round((l.l_extendedprice * (1.0 - l.l_discount)) * 10000, 0) AS BIGINT)) AS BIGINT) AS rev_c,
           CAST(SUM(CAST(round((l.l_extendedprice * (1.0 - l.l_discount)) * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0 AS lost_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{Q10_QTR_START}'
      AND o.o_orderdate < TIMESTAMP '{Q10_QTR_END}'
    GROUP BY 1, 2, 3
)
QUALIFY rank <= {Q10_TOP}
"""


# ---------------------------------------------------------------------------
# Q12-shaped: shipping-delay bands x order priority split
# ---------------------------------------------------------------------------


def q12_delay_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: the published query counts high- vs low-priority
    orders per ship mode for late shipments; the fixture has no
    l_shipmode/l_commitdate, so the SHAPE is kept over what it does
    have — shipping DELAY bands (days between o_orderdate and
    l_shipdate: <30, 30-59, >=60) with the same CASE-sum priority split
    (1-URGENT/2-HIGH vs the rest).

    Plan: one lineitem->orders join (orders projected to key + date +
    priority), the band and both priority counters computed as codegen
    CASE aggregates in ONE combinable rollup — never one scan per band."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(delay < 30, "lt30")
        .when(delay < 60, "d30_59")
        .otherwise("ge60")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(band.alias("delay_band"), high.alias("hi"))
        .groupBy("delay_band")
        .agg(
            F.sum(F.col("hi").cast("long")).alias("high_line_count"),
            F.sum((~F.col("hi")).cast("long")).alias("low_line_count"),
        )
    )


Q12_ORACLE = """
SELECT delay_band,
       CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN hi THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 30 THEN 'lt30'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 60 THEN 'd30_59'
                ELSE 'ge60' END AS delay_band,
           o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
GROUP BY delay_band
"""


# ---------------------------------------------------------------------------
# Q16-shaped: supplier variety per part class
# ---------------------------------------------------------------------------


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: how many DISTINCT suppliers serve each (brand,
    type, size) part class — the published query walks partsupp; the
    fixture has no partsupp, so the realized part-supplier relation is
    recovered from lineitem (distinct (l_partkey, l_suppkey) pairs, the
    pairs that actually shipped).

    Plan: the distinct pair projection shrinks lineitem to at most
    |parts| x |suppliers| rows BEFORE the broadcast part join; the
    count-distinct rolls up the already-distinct pairs with a combinable
    count. Ordered output (supplier_cnt DESC, then class) is left to the
    consumer — the gate hashes rows order-free."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    return (
        pairs.join(F.broadcast(part), pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON ps.l_partkey = p.p_partkey
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q22-shaped: idle high-balance customers per nation
# ---------------------------------------------------------------------------

Q22_CUTOFF = "1999-01-01 00:00:00"


def q22_idle_customers(
    spark: SparkSession, sf_dir: str, cutoff: str = Q22_CUTOFF
) -> DataFrame:
    """TPC-H Q22-shaped: customers with ABOVE-AVERAGE account balance who
    placed NO orders since ``cutoff`` (the published "have not placed
    orders for 7 years" dormancy rule — every fixture customer has SOME
    order, so never-ordered would be vacuous) — per country. The
    published query derives the country from the phone prefix and
    averages over positive balances; the fixture has no phone, so the
    nation key is the country and the positive-balance average rule is
    kept.

    Plan: the global average is one tiny aggregate crossed in via
    broadcast (integer-cent sum / count, exact); the dormancy test is a
    LEFT ANTI join against the cutoff-filtered orders (the filter prunes
    the anti side's scan); the rollup is per-nation combinable sums. The
    acctbal comparison happens in integer cents on both engines, so the
    boundary customer can't flip on a float ulp."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        _cents(F.col("c_acctbal")).alias("bal_c"),
    )
    avg_pos = (
        cust.where(F.col("bal_c") > 0)
        .agg(
            F.sum("bal_c").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select((F.col("s").cast("double") / F.col("n")).alias("avg_c"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp"))
        .select("o_custkey")
    )
    idle = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    )
    return (
        idle.crossJoin(F.broadcast(avg_pos))
        .where(F.col("bal_c").cast("double") > F.col("avg_c"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c").cast("double") / 100.0).alias("totacctbal"),
        )
    )


def q22_oracle_sql(cutoff: str = Q22_CUTOFF) -> str:
    """Oracle builder taking the same ``cutoff`` as the operator, so a
    non-default cutoff run grades against a matching oracle."""
    return f"""
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bal_c) AS DOUBLE) / 100.0 AS totacctbal
FROM (
    SELECT c_custkey, c_nationkey,
           CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
    FROM customer
) c
WHERE CAST(bal_c AS DOUBLE) > (
    SELECT CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS DOUBLE)
           / COUNT(*)
    FROM customer WHERE round(c_acctbal * 100, 0) > 0
)
AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '{cutoff}')
GROUP BY c_nationkey
"""


Q22_ORACLE = q22_oracle_sql()


# ---------------------------------------------------------------------------
# Q15-shaped: top supplier(s) by window revenue (view + max-equality)
# ---------------------------------------------------------------------------

Q15_START = "1996-01-01 00:00:00"
Q15_END = "1996-04-01 00:00:00"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: per-supplier revenue over one quarter's shipped
    lineitems, returning the supplier(s) whose revenue EQUALS the maximum
    (the published query's revenue-view + scalar-max correlated filter;
    ties all return, as in the spec).

    Exactness: revenue is an integer-cent sum, so the max-equality filter
    compares exact integers — no float-max tie hazard. Plan shape: one
    pruned lineitem scan -> combinable per-supplier rollup (10s-of-rows
    frame at any scale: |suppliers|); the scalar max broadcasts back over
    it; the supplier dim broadcasts onto the winners."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 10_000
    )
    # the rollup feeds BOTH the scalar max and the probe — pin it so the
    # quarter-pruned lineitem scan runs once, not per consumer
    revenue = (
        li.groupBy("l_suppkey").agg(F.sum(rev).alias("rev_c")).localCheckpoint()
    )
    mx = revenue.agg(F.max("rev_c").alias("max_c"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("rev_c") == F.col("max_c"))
        .join(
            F.broadcast(supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / 10_000.0).alias(
                "total_revenue"
            ),
        )
    )


Q15_ORACLE = f"""
WITH revenue AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(round((l_extendedprice * (1.0 - l_discount)) * 10000, 0) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
      AND l_shipdate < TIMESTAMP '{Q15_END}'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.rev_c AS DOUBLE) / 10000.0 AS total_revenue
FROM revenue r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rev_c = (SELECT MAX(rev_c) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q17-shaped: small-quantity-order revenue (per-part avg correlated filter)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#23"
Q17_MAX_SIZE = 10


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: average yearly revenue lost if small-quantity
    orders for one brand's small parts were not filled — lineitems whose
    quantity is below 20% of the part's average ordered quantity (the
    published per-part correlated AVG; the fixture has no p_container, so
    the part class is brand + size bracket).

    Exactness: ``qty < 0.2 * avg(qty)`` is evaluated as the integer
    cross-multiplication ``5 * qty_c * n < sum_qty_c`` (n > 0), so the
    correlated-average comparison never touches a float; the single
    output division happens once. Plan shape: the part class broadcasts
    onto the lineitem scan; the compact (part, qty, price) frame is
    checkpoint-pinned and consumed by BOTH the per-part rollup and the
    probe side, so the scan+join run once; the rollup rejoins broadcast
    (|parts in class| rows)."""
    parts = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == Q17_BRAND)
        & (F.col("p_size") <= Q17_MAX_SIZE)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    hits = (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
        .select(
            "l_partkey",
            _cents(F.col("l_quantity")).alias("qty_c"),
            _cents(F.col("l_extendedprice")).alias("ext_c"),
        )
        .localCheckpoint()
    )
    stats = hits.groupBy("l_partkey").agg(
        F.sum("qty_c").alias("sum_qty_c"),
        F.count(F.lit(1)).alias("n"),
    )
    small = hits.join(F.broadcast(stats), "l_partkey").where(
        F.lit(5) * F.col("qty_c") * F.col("n") < F.col("sum_qty_c")
    )
    return small.agg(
        F.count(F.lit(1)).cast("long").alias("n_small"),
        (
            F.sum("ext_c").cast("double") / (7.0 * 100.0)
        ).alias("avg_yearly"),
    )


Q17_ORACLE = f"""
WITH hits AS (
    SELECT l.l_partkey,
           CAST(round(l.l_quantity * 100, 0) AS BIGINT) AS qty_c,
           CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS ext_c
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = '{Q17_BRAND}' AND p.p_size <= {Q17_MAX_SIZE}
),
stats AS (
    SELECT l_partkey,
           CAST(SUM(qty_c) AS BIGINT) AS sum_qty_c,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM hits GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
       CAST(SUM(h.ext_c) AS DOUBLE) / (7.0 * 100.0) AS avg_yearly
FROM hits h
JOIN stats s USING (l_partkey)
WHERE 5 * h.qty_c * s.n < s.sum_qty_c
"""


# ---------------------------------------------------------------------------
# Q21-shaped: suppliers who kept multi-supplier orders waiting
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 60
Q21_TOP = 20


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: for finalized ('F') orders involving MORE THAN
    ONE supplier, count the lineitems whose supplier was the ONLY late
    one on the order — the published exists/not-exists pair. The fixture
    has no commit/receipt dates, so "late" is shipped more than
    ``Q21_LATE_DAYS`` days after the order date.

    The published per-lineitem form (l1 late, EXISTS another-supplier
    lineitem, NOT EXISTS another-supplier LATE lineitem) is evaluated
    set-based: per order, distinct-supplier and distinct-LATE-supplier
    counts; a late l1 qualifies iff n_supp >= 2 and n_late_supp = 1
    (l1's supplier is late, so a singleton late-set is exactly
    {l1.supplier} — the two forms are equivalent, and the oracle renders
    the identical set-based formulation). Plan shape: one orders-filtered
    join pinned once for both the per-order rollup and the probe; the
    per-order stats frame joins back on the order key; supplier dim
    broadcasts; top-20 via TakeOrderedAndProject."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate")
                + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
            ).alias("late"),
        )
        .localCheckpoint()
    )
    ostats = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    qual = (
        joined.where(F.col("late"))
        .join(ostats, "l_orderkey")
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    topk = (
        qual.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(Q21_TOP)
    )
    w = Window.orderBy(F.desc("numwait"), F.asc("s_suppkey"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank",
        "s_suppkey",
        "s_name",
        F.col("numwait").cast("long").alias("numwait"),
    )


Q21_ORACLE = f"""
WITH joined AS (
    SELECT l.l_orderkey, l.l_suppkey,
           l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS late
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
),
ostats AS (
    SELECT l_orderkey,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS BIGINT)
               AS n_late_supp
    FROM joined GROUP BY l_orderkey
),
qual AS (
    SELECT j.l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM joined j
    JOIN ostats s USING (l_orderkey)
    WHERE j.late AND s.n_supp >= 2 AND s.n_late_supp = 1
    GROUP BY j.l_suppkey
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY numwait DESC, s_suppkey ASC) AS INT)
           AS rank,
       s.s_suppkey, s.s_name, q.numwait
FROM qual q
JOIN supplier s ON q.l_suppkey = s.s_suppkey
QUALIFY rank <= {Q21_TOP}
"""


# ---------------------------------------------------------------------------
# Q2-shaped: min-cost supplier per part within a region
# ---------------------------------------------------------------------------

Q2_REGION = "EUROPE"
Q2_TYPE = "STANDARD"
Q2_MAX_SIZE = 15
Q2_TOP = 100


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: for each part of one type/size class, the supplier
    in one REGION offering it at the minimum cost (the published
    correlated-MIN-per-part); top 100 by supplier account balance. The
    fixture has no partsupp, so "cost" is the minimum realized unit price
    of that (part, supplier)'s lineitems — round((extendedprice /
    quantity) * 100): one exactly-rounded IEEE division with the same
    literal shape in the oracle, then integer MINs and an integer-exact
    per-part argmin (ties to the lower s_suppkey).

    Plan shape: part class and the nation->region chain broadcast; the
    (part, supplier) cost rollup is one combinable aggregate over the
    pruned lineitem scan; the per-part argmin is a struct-MIN (map-side
    combinable), never a window over the corpus; top-100 via
    TakeOrderedAndProject."""
    parts = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
    ).select("p_partkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q2_REGION
    ).select("r_regionkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(reg),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(
            (F.col("l_extendedprice") / F.col("l_quantity")) * F.lit(100), 0
        )
        .cast("long")
        .alias("unit_c"),
    )
    rsupp = supp.select(F.col("s_suppkey").alias("rs_suppkey"))
    cost = (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
        .join(
            F.broadcast(rsupp),
            li["l_suppkey"] == F.col("rs_suppkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_c").alias("cost_c"))
    )
    best = (
        cost.groupBy("l_partkey")
        .agg(
            F.min(F.struct("cost_c", F.col("l_suppkey").alias("sk"))).alias(
                "b"
            )
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("b.sk").alias("s_suppkey"),
            F.col("b.cost_c").alias("cost_c"),
        )
    )
    return (
        best.join(F.broadcast(supp), "s_suppkey")
        .orderBy(
            F.desc("s_acctbal"), F.asc("s_suppkey"), F.asc("p_partkey")
        )
        .limit(Q2_TOP)
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "s_acctbal",
            F.col("n_name").alias("nation"),
            (F.col("cost_c").cast("double") / 100.0).alias("min_cost"),
        )
    )


Q2_ORACLE = f"""
WITH supp AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{Q2_REGION}'
),
cost AS (
    SELECT l.l_partkey, l.l_suppkey,
           CAST(MIN(CAST(round((l.l_extendedprice / l.l_quantity) * 100, 0)
                         AS BIGINT)) AS BIGINT) AS cost_c
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supp s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_type = '{Q2_TYPE}' AND p.p_size <= {Q2_MAX_SIZE}
    GROUP BY l.l_partkey, l.l_suppkey
),
best AS (
    SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, cost_c FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY l_partkey ORDER BY cost_c ASC, l_suppkey ASC
        ) AS rn FROM cost
    ) WHERE rn = 1
)
SELECT b.p_partkey, b.s_suppkey, s.s_name, s.s_acctbal,
       s.n_name AS nation,
       CAST(b.cost_c AS DOUBLE) / 100.0 AS min_cost
FROM best b JOIN supp s USING (s_suppkey)
ORDER BY s.s_acctbal DESC, b.s_suppkey ASC, b.p_partkey ASC
LIMIT {Q2_TOP}
"""


# ---------------------------------------------------------------------------
# Q8-shaped: national market share within a region by year
# ---------------------------------------------------------------------------

Q8_REGION = "ASIA"
Q8_NATION = "NATION_12"
Q8_TYPE = "ECONOMY"
Q8_START = "1996-01-01 00:00:00"
Q8_END = "1998-01-01 00:00:00"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: one supplier-nation's share of the volume sold to
    customers of one REGION, for one part type, by order year. Share =
    nation volume / total volume — both integer-cent sums, one division
    per year row.

    Plan shape: part class, customer->nation->region chain, and the
    supplier-nation flag all broadcast onto the two-fact join
    (lineitem x pruned orders); the per-year rollup carries BOTH sums in
    one combinable pass (conditional sum for the nation numerator),
    never a union of per-nation scans."""
    parts = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == Q8_TYPE
    ).select("p_partkey")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q8_REGION
    ).select("r_regionkey")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(reg),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nat.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("sn_name"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select(
            "s_suppkey", (F.col("sn_name") == Q8_NATION).alias("is_nation")
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit(Q8_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q8_END).cast("timestamp"))
        )
        .join(
            F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
        )
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
            10_000,
        ).alias("vol_c"),
    )
    joined = (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("is_nation"), F.col("vol_c")).otherwise(
                    F.lit(0)
                )
            ).alias("nat_c"),
            F.sum("vol_c").alias("tot_c"),
        )
        .select(
            F.col("o_year").cast("int").alias("o_year"),
            (F.col("nat_c").cast("double") / F.col("tot_c").cast("double"))
            .alias("mkt_share"),
            (F.col("tot_c").cast("double") / 10_000.0).alias("total_volume"),
        )
    )


Q8_ORACLE = f"""
WITH cust AS (
    SELECT c.c_custkey FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{Q8_REGION}'
),
supp AS (
    SELECT s.s_suppkey, n.n_name = '{Q8_NATION}' AS is_nation
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
),
joined AS (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year, sp.is_nation,
           CAST(round((l.l_extendedprice * (1.0 - l.l_discount)) * 10000, 0)
                AS BIGINT) AS vol_c
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN cust c ON o.o_custkey = c.c_custkey
    JOIN supp sp ON l.l_suppkey = sp.s_suppkey
    WHERE p.p_type = '{Q8_TYPE}'
      AND o.o_orderdate >= TIMESTAMP '{Q8_START}'
      AND o.o_orderdate < TIMESTAMP '{Q8_END}'
)
SELECT o_year,
       CAST(SUM(CASE WHEN is_nation THEN vol_c ELSE 0 END) AS DOUBLE)
           / CAST(SUM(vol_c) AS DOUBLE) AS mkt_share,
       CAST(SUM(vol_c) AS DOUBLE) / 10000.0 AS total_volume
FROM joined GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q9-shaped: product-class profit by supplier nation x order year
# ---------------------------------------------------------------------------

Q9_NAME_PART = "widget"


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped: profit on one product class (p_name contains a
    token) grouped by supplier nation and order year. The fixture has no
    ps_supplycost, so cost is modeled as 60% of the part's retail price
    per unit: profit = extprice*(1-discount) - 0.6*retailprice*quantity —
    evaluated entirely in 10^-4 fixed point (rev_4 - 60*retail_c*qty_i,
    all integers), with ONE double division on output.

    Plan shape: part class and nation dims broadcast; orders joins only
    for the year; one combinable rollup per (nation, year)."""
    parts = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q9_NAME_PART)
    ).select(
        "p_partkey", _cents(F.col("p_retailprice")).alias("retail_c")
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
            10_000,
        ).alias("rev_4"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty_i"),
    )
    profit = (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            "nation",
            "o_year",
            (
                F.col("rev_4")
                - F.lit(60) * F.col("retail_c") * F.col("qty_i")
            ).alias("profit_4"),
        )
    )
    return (
        profit.groupBy("nation", "o_year")
        .agg(F.sum("profit_4").alias("p4"))
        .select(
            "nation",
            F.col("o_year").cast("int").alias("o_year"),
            (F.col("p4").cast("double") / 10_000.0).alias("sum_profit"),
        )
    )


Q9_ORACLE = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(SUM(
           CAST(round((l.l_extendedprice * (1.0 - l.l_discount)) * 10000, 0)
                AS BIGINT)
           - 60 * CAST(round(p.p_retailprice * 100, 0) AS BIGINT)
                * CAST(round(l.l_quantity, 0) AS BIGINT)
       ) AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%{Q9_NAME_PART}%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q11-shaped: important stock (share-of-total threshold)
# ---------------------------------------------------------------------------

Q11_NATION = "NATION_12"
Q11_MEAN_MULT = 2  # keep parts whose value exceeds 2x the mean part value


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: parts representing a significant share of one
    nation's supplied value. The fixture has no partsupp, so value is the
    realized supplied value (sum of extendedprice) of the nation's
    suppliers' lineitems per part. The published query scales its
    fraction threshold by SF (a fixed fraction yields zero rows as the
    part count grows); the scale-robust equivalent keeps parts above
    ``Q11_MEAN_MULT`` x the MEAN part value, as the integer
    cross-multiplication ``val_c * n_parts > MULT * total_c`` — the same
    scalar-subquery-threshold shape, no float compare, non-empty at
    every fixture SF (12 / 32 / 1227 rows at sf0.001/0.01/0.1).

    Plan shape: nation-filtered supplier dim broadcasts; one combinable
    per-part rollup; the grand total broadcasts back over it (single
    row)."""
    nat = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == Q11_NATION
    ).select("n_nationkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        _cents(F.col("l_extendedprice")).alias("ext_c"),
    )
    # the rollup feeds BOTH the grand total and the threshold probe — pin
    # it so the supplier-filtered lineitem scan runs once, not per consumer
    per_part = (
        li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum("ext_c").alias("val_c"))
        .localCheckpoint()
    )
    total = per_part.agg(
        F.sum("val_c").alias("total_c"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("val_c") * F.col("n_parts")
            > F.lit(Q11_MEAN_MULT) * F.col("total_c")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("val_c").cast("double") / 100.0).alias("value"),
        )
    )


Q11_ORACLE = f"""
WITH per_part AS (
    SELECT l.l_partkey,
           CAST(SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS val_c
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = '{Q11_NATION}'
    GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey,
       CAST(val_c AS DOUBLE) / 100.0 AS value
FROM per_part
WHERE val_c * (SELECT COUNT(*) FROM per_part)
      > {Q11_MEAN_MULT} * (SELECT SUM(val_c) FROM per_part)
"""


# ---------------------------------------------------------------------------
# Q20-shaped: dominant suppliers of a part class in a year
# ---------------------------------------------------------------------------

Q20_NAME_PART = "bolt"
Q20_YEAR_START = "1997-01-01 00:00:00"
Q20_YEAR_END = "1998-01-01 00:00:00"
Q20_REGION = "EUROPE"


def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: suppliers in one region who supplied MORE THAN
    HALF of a part's total volume for a name-filtered part class in one
    year (the published availqty > 0.5 * sum(l_quantity) threshold,
    realized over shipped quantities since the fixture has no partsupp):
    2 * qty(part, supplier) > qty(part) — integers throughout. Output is
    the distinct qualifying suppliers (the published semi-join shape).

    Plan shape: part class + region-filtered supplier dim broadcast; one
    (part, supplier) rollup; the per-part total derives from the same
    rollup (no second scan); the final distinct is over a tiny frame."""
    parts = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains(Q20_NAME_PART)
    ).select("p_partkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    reg = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q20_REGION
    ).select("r_regionkey")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(reg),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(Q20_YEAR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_YEAR_END).cast("timestamp"))
    ).select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_quantity"), 0).cast("long").alias("qty_i"),
    )
    # the (part, supplier) rollup feeds BOTH the per-part total and the
    # probe side — pin it so the lineitem scan runs once, not per consumer
    ps = (
        li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty_i").alias("sq"))
        .localCheckpoint()
    )
    ptot = ps.groupBy("l_partkey").agg(F.sum("sq").alias("pq"))
    dom = (
        ps.join(F.broadcast(ptot), "l_partkey")
        .where(F.lit(2) * F.col("sq") > F.col("pq"))
        .select("l_suppkey")
        .distinct()
    )
    return dom.join(
        F.broadcast(supp), dom["l_suppkey"] == supp["s_suppkey"]
    ).select("s_suppkey", "s_name")


Q20_ORACLE = f"""
WITH ps AS (
    SELECT l.l_partkey, l.l_suppkey,
           CAST(SUM(CAST(round(l.l_quantity, 0) AS BIGINT)) AS BIGINT) AS sq
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%{Q20_NAME_PART}%'
      AND l.l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
      AND l.l_shipdate < TIMESTAMP '{Q20_YEAR_END}'
    GROUP BY l.l_partkey, l.l_suppkey
),
ptot AS (
    SELECT l_partkey, CAST(SUM(sq) AS BIGINT) AS pq FROM ps GROUP BY l_partkey
),
dom AS (
    SELECT DISTINCT ps.l_suppkey
    FROM ps JOIN ptot USING (l_partkey)
    WHERE 2 * ps.sq > ptot.pq
)
SELECT s.s_suppkey, s.s_name
FROM dom d
JOIN supplier s ON d.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q20_REGION}'
"""
