"""Skew-aware aggregation helpers.

Spark's hash aggregation already neutralizes key skew for algebraic
aggregates (sum/count/min/max): map-side partial aggregation means the
shuffle carries one row per (partition, key), so a hot key costs one
shuffle row per upstream partition, not its full row count. The
reference's documented OOM regime (README.md:666-698) is therefore
already survivable.

What skew DOES break at 100 TB are *holistic* aggregates — exact
distinct counts, collect_set — where every row of a hot key must meet
in one task. These helpers restore the two-stage shape:

* :func:`salted_count_distinct` — exact COUNT(DISTINCT col) per key.
  Stage 1 groups by (key, hash(col) % salt): the distinct sets of
  different salt buckets are disjoint *by construction* (same value →
  same bucket), so stage 2 can SUM the per-bucket distinct counts.
  A key with billions of rows fans out over `salt` reducers.
* :func:`salted_top_values` — per-key top-N values by weight: partial
  top-N per salt bucket, re-rank after the merge. (The reference's
  future-work "top-N filtering", docs/design-stateful.md:166.)

AQE's skew-join splitting (enabled in session.get_spark) covers the
join side; these cover aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    salt: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col), skew-proof.

    Equivalent to ``df.groupBy(keys).agg(countDistinct(col))`` but the
    heavy de-duplication happens across ``salt`` parallel buckets per
    key instead of one task per key.
    """
    bucket = F.pmod(F.xxhash64(F.col(col)), F.lit(salt))
    stage1 = (
        df.groupBy(*keys, bucket.alias("__dn_salt"))
        .agg(F.count_distinct(F.col(col)).alias("__dn_part"))
    )
    return (
        stage1.groupBy(*keys)
        .agg(F.sum("__dn_part").cast("long").alias(out_col))
    )


def salted_top_values(
    df: DataFrame,
    keys: list[str],
    col: str,
    n: int = 10,
    weight_col: str | None = None,
    salt: int = 64,
) -> DataFrame:
    """Per-key top-N values of ``col`` by total weight (count when
    ``weight_col`` is None). Output: keys + (value, weight, rank).

    Shape: per-(key, value) weights aggregate algebraically (skew-safe
    partial agg); candidate pruning takes the top n *per salt bucket*
    before the final per-key rank, so no single task ever ranks a hot
    key's full value set.
    """
    # keep the summed weight in its natural type: casting doubles to
    # long before ranking would truncate 1.9 vs 1.2 to a tie and can
    # reorder (or drop) the true top-N. Counts still come out long.
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    per_value = (
        df.groupBy(*keys, F.col(col).alias("__dn_value"))
        .agg(F.sum(w).alias("__dn_weight"))
    )
    bucket = F.pmod(F.xxhash64(F.col("__dn_value")), F.lit(salt))
    win_b = W.partitionBy(*keys, "__dn_bucket").orderBy(
        F.desc("__dn_weight"), F.asc("__dn_value")
    )
    pruned = (
        per_value.withColumn("__dn_bucket", bucket)
        .withColumn("__dn_rb", F.row_number().over(win_b))
        .filter(F.col("__dn_rb") <= n)
    )
    win = W.partitionBy(*keys).orderBy(F.desc("__dn_weight"), F.asc("__dn_value"))
    return (
        pruned.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= n)
        .select(
            *keys,
            F.col("__dn_value").alias("value"),
            F.col("__dn_weight").alias("weight"),
            "rank",
        )
    )
