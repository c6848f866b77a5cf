"""K-minimum-values (KMV) distinct-count sketch — the mergeable
cardinality estimator (Bar-Yossef et al. 2002; the bottom-k form
DataSketches ships as Theta). Hash every value into [0, 2⁶⁰); the
k-th smallest DISTINCT hash h_k estimates the cardinality as
(k−1)·2⁶⁰ / h_k (uniform order statistics: k points at spacing
≈ space/n put the k-th at ≈ k·space/n). With fewer than k distinct
values the sketch degenerates to the exact count.

Why this sketch here: unlike HyperLogLog (engine-specific register
layouts, unportable) the KMV estimate is a pure function of the k
smallest md5 prefixes — DETERMINISTIC, so a DuckDB twin computes the
bit-identical estimate and the operator is value-hash gradable like
everything else in the registry. The error is the usual
O(1/√k) (k=256 → ~6%), and two sketches MERGE exactly: the k
smallest of a union are among the union of each side's k smallest —
the property that lets per-partition partial sketches combine into
the global one with no approximation on top of the sketch itself.

Scale shape: phase 1 prunes per Arrow batch to each group's k
smallest distinct hashes (pandas sort+head — output ≤ k rows per
group per batch, so the shuffle that follows carries sketch-sized
data, never the corpus); phase 2 is one distinct + one
group-partitioned row_number over the pruned rows (≤ k·n_batches per
group) to find h_k. The full corpus is scanned once and hashed
JVM-side (md5 expression); Python only ever sees (group, hash)
longs. This is exactly how a 100 TB vocabulary census should run —
the alternative exact COUNT(DISTINCT) shuffles every distinct token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: hash space: first 15 hex chars of md5 → 60 bits, exact in BIGINT
#: and in an IEEE double (2⁶⁰ < 2⁶³; the estimate's single division
#: is one double op, identical in any engine)
HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS


def kmv_hash(col: Column | str) -> Column:
    """Value → uniform 60-bit BIGINT via md5 prefix (the registry's
    portable-hash idiom; DuckDB twin:
    ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def kmv_sketch_rows(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """The SKETCH itself: per group, exactly the k smallest distinct
    60-bit hashes of ``value_col`` (all of them when a group has < k
    distinct values) as (*group_cols, h) rows. This is the mergeable
    state — bottom-k of a union == bottom-k over the union of two
    bottom-k sets, so per-batch sketch rows fold into a running store
    with zero approximation on top of the sketch
    (:mod:`dragnet_spark.index.kmv`)."""
    if k < 2:
        raise ValueError("KMV needs k >= 2 (the estimator is (k-1)/h_k)")
    # NULL values are excluded, matching SQL COUNT(DISTINCT) semantics
    # — md5(NULL) hashes to NULL, which Spark's window would sort
    # NULLS FIRST and DuckDB's NULLS LAST, so an unfiltered NULL would
    # silently diverge the two engines' k-th minimum
    rows = df.select(*group_cols, kmv_hash(value_col).alias("h")).filter(
        F.col("h").isNotNull()
    )
    return bottom_k(rows, group_cols, k)


def bottom_k(rows: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Exact per-group k smallest DISTINCT ``h`` values of a
    (*group_cols, h) table. Phase 1 prunes per Arrow batch (≤ k rows
    per group per batch survive — sketch-sized shuffle); phase 2 is
    one distinct + group-partitioned row_number over the pruned
    superset. NULL group keys are a group like any other (SQL GROUP BY
    semantics — the pandas prune passes ``dropna=False``, since the
    default would silently drop NULL-keyed groups from the sketch);
    ``h`` must be non-null (callers hash with :func:`kmv_hash` and
    filter — NULL sorts differently in Spark and DuckDB windows)."""
    import pandas as pd  # noqa: F401 — mapInPandas dependency

    schema = rows.schema

    def prune(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            d = pdf.drop_duplicates()
            # sort by h alone: groupby(...).head(k) preserves row
            # order, so each group keeps its k smallest regardless of
            # how NULL group keys would sort as a leading sort key
            yield d.sort_values("h").groupby(
                list(group_cols), sort=False, dropna=False
            ).head(k)

    pruned = rows.mapInPandas(prune, schema=schema).distinct()
    w = W.partitionBy(*group_cols).orderBy("h")
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def estimate_from_sketch(
    sketch: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """(group, est_distinct) from exact bottom-k sketch rows: a group
    holding fewer than k hashes IS its exact distinct count; at k the
    estimator is floor((k-1)·2⁶⁰ / h_k)."""
    est = F.when(
        F.col("nd") < k, F.col("nd")  # < k distinct: sketch is exact
    ).otherwise(
        F.floor(
            F.lit(float((k - 1) * HASH_SPACE)) / F.col("hk").cast("double")
        ).cast("long")
    )
    return (
        sketch.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("nd"), F.max("h").alias("hk"))
        .select(*group_cols, est.cast("long").alias("est_distinct"))
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Per group: ``est_distinct`` — the KMV estimate of the number
    of distinct ``value_col`` values (exact when a group has < k
    distinct values). Deterministic: same input → same estimate on
    any engine."""
    return estimate_from_sketch(
        kmv_sketch_rows(df, value_col, group_cols, k), group_cols, k
    )


def kmv_distinct_sql(
    value_expr: str,
    group_cols: list[str],
    source_sql: str,
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`kmv_distinct` (no pruning phase — the
    k-th order statistic is the k-th order statistic): yields
    (*group_cols, est_distinct)."""
    g = ", ".join(group_cols)
    return f"""
    WITH src AS ({source_sql}),
    h AS (SELECT DISTINCT {g},
                 CAST('0x' || substring(md5({value_expr}), 1, 15) AS BIGINT) AS h
          FROM src
          WHERE {value_expr} IS NOT NULL),
    ranked AS (SELECT {g}, h,
                      row_number() OVER (PARTITION BY {g} ORDER BY h) AS rn
               FROM h),
    agg AS (SELECT {g}, COUNT(*) AS nd,
                   MAX(CASE WHEN rn = {k} THEN h END) AS hk
            FROM ranked GROUP BY {g})
    SELECT {g},
           CAST(CASE WHEN hk IS NULL THEN nd
                ELSE floor({float((k - 1) * HASH_SPACE)} / CAST(hk AS DOUBLE))
           END AS BIGINT) AS est_distinct
    FROM agg
    """
