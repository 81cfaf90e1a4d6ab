"""Z-order (Morton-curve) clustering keys for multi-dimensional data skipping.

Parquet/lake data skipping works off per-file min/max ranges. Sorting 100 TB
by ONE column gives perfect pruning on that column and none on any other;
interleaving the bits of two columns (the Morton / Z-order curve — the
technique behind Delta Lake's OPTIMIZE ZORDER and the classic UB-tree) makes
files that are simultaneously narrow in BOTH dimensions, so a predicate on
either column (or both) prunes most files. The write path is simply
``repartitionByRange(zvalue).sortWithinPartitions(zvalue)`` before the
parquet write — the curve does the rest.

This operator computes the interleave itself — pure codegen bit arithmetic
(shift/and/or, no UDF, no shuffle) — and grades the resulting layout: group
rows by Z-range bucket (the "file" a range-partitioned write would place
them in) and emit each bucket's extent in both source dimensions. Tight
per-bucket extents ARE the data-skipping guarantee; the gate hashes them
exactly.

Dimensions (events): ``user_id`` and ``value`` quantized to integer cents
via the engine's fixed-point rule (floor(v*100 + 0.5) — the same IEEE ops
in both engines, ties away from zero like JS toFixed). 16 bits each →
a 32-bit Morton code; BUCKET_SHIFT high bits address the bucket.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits kept per dimension
BUCKET_SHIFT = 20  # bucket = zvalue >> shift (4096 possible buckets)


def _cents(col: Column) -> Column:
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")


def _cents_sql(expr: str) -> str:
    return f"CAST(floor({expr} * 100.0 + 0.5) AS BIGINT)"


def morton_interleave(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton code: bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def morton_interleave_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def morton_interleave_py(x: int, y: int, bits: int = Z_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_layout(events: DataFrame) -> DataFrame:
    """Per-Z-bucket extents of both dimensions — the skipping profile a
    Z-ordered file layout would expose as parquet footer min/max."""
    x = F.col("user_id").bitwiseAND(F.lit((1 << Z_BITS) - 1))
    y = _cents(F.col("value")).bitwiseAND(F.lit((1 << Z_BITS) - 1))
    z = morton_interleave(x, y)
    return (
        events.where(F.col("value").isNotNull())
        .select(
            F.shiftright(z, BUCKET_SHIFT).alias("bucket"),
            F.col("user_id").alias("user_id"),
            _cents(F.col("value")).alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


def zorder_layout_oracle_sql() -> str:
    mask = (1 << Z_BITS) - 1
    x = f"(user_id & {mask})"
    y = f"({_cents_sql('value')} & {mask})"
    z = morton_interleave_sql(x, y)
    return f"""
WITH coded AS (
    SELECT (({z}) >> {BUCKET_SHIFT}) AS bucket,
           user_id,
           {_cents_sql('value')} AS cents
    FROM events
    WHERE value IS NOT NULL
)
SELECT bucket,
       COUNT(*) AS n,
       MIN(user_id) AS min_user,
       MAX(user_id) AS max_user,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents
FROM coded
GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# Small-file compaction planning (Delta OPTIMIZE-style bin packing).
# ---------------------------------------------------------------------------

# Target compacted-file size. The fixture's "files" are documents (size =
# n_chars, partition = source); production swaps in a real file listing —
# the plan shape is identical.
COMPACT_TARGET = 4096


def compaction_bins(documents: DataFrame) -> DataFrame:
    """Per-partition sequential bin packing of small files into
    target-sized compaction groups, plus each group's manifest row.

    Every long-lived lake table accretes small files (streaming commits,
    per-batch appends); compaction rewrites them into ~target-sized files.
    The planning step is this operator: within each table partition, walk
    the files in a stable order and cut a new bin whenever the running
    byte total crosses the target — exactly the cumulative-sum
    quantization Delta Lake's OPTIMIZE binPacking performs. ``bin_id =
    floor(bytes_packed_before_me / target)`` reproduces that sequential
    walk as a window cumsum, so the whole plan is one per-partition
    window + one map-side-combinable aggregate — no driver-side loop over
    the file listing (the classic scale failure: 100 TB tables hold 10^7+
    files; the listing itself is a DataFrame here).

    Physical shape: repartition on the table-partition key with a PINNED
    partition count (``repartition(n, key)`` — exempt from AQE's
    byte-based coalescing, which would otherwise collapse this
    bytes-small frame to one task), sortWithinPartitions for the window
    order — no global sort — then a hash aggregate on (partition, bin).

    Determinism: integer sizes, integer cumsum, integer floor-division —
    no floats anywhere.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_chars").over(w)
    files = documents.repartition(32, "source").select(
        "source",
        "doc_id",
        "n_chars",
        F.floor((cum - F.col("n_chars")) / F.lit(COMPACT_TARGET)).alias(
            "bin_id"
        ),
    )
    return files.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_chars").alias("total_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def compaction_bins_oracle_sql() -> str:
    return f"""
WITH packed AS (
    SELECT source, doc_id, n_chars,
           CAST(FLOOR(
               (SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_chars)
               / {COMPACT_TARGET}.0
           ) AS BIGINT) AS bin_id
    FROM documents
)
SELECT source, bin_id,
       COUNT(*) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, bin_id
"""
