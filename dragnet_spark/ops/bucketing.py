"""Bucketed (co-located) joins: pre-shuffle once, join forever free.

The heaviest recurring cost in fact-to-fact joins (orders ⋈ lineitem
at 100 TB) is re-shuffling both sides on the join key every run.
Hive-style bucketing pays that shuffle once at write time: both tables
are written with ``bucketBy(n, key)``, and any later equi-join or
aggregation on the key reads matching buckets pairwise — the plan
contains NO Exchange on either side (asserted in tests).

Sizing guidance for 100 TB: pick ``num_buckets`` so one bucket of the
larger table is a few hundred MB (e.g. 30 TB fact / 512 MB ≈ 65k →
round to a power of two); both tables MUST use the same bucket count
and key for exchange-free joins. ``sortBy`` the key too so the join
degenerates to a zipper merge of pre-sorted buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (and bucket-sorted) parquet
    table in the session catalog."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.
    With matching bucket specs the physical plan is a SortMergeJoin
    over co-located buckets — no shuffle Exchange on either side."""
    return spark.table(left).join(spark.table(right), on, how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan —
    the thing bucketing is supposed to eliminate (test/diagnostic)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln or "Exchange rangepartitioning" in ln
    )
