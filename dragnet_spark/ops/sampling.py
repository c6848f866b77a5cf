"""Deterministic sampling / dataset-split operators.

Training pipelines need splits and samples that are (a) reproducible
across runs and engines, (b) stable under repartitioning, and (c) free
of coordination — which rules out `df.sample()` (seed + partition
dependent) and any RNG. Everything here derives from a 28-bit md5
prefix of the row's id (same portable hash the dedup family uses:
identical bytes → identical hex on any engine), so a row's split
assignment is a pure function of its id: adding or removing other rows
never moves it, and the DuckDB oracle reproduces it bit-for-bit.

Scale shape: a hash filter is a narrow map — no shuffle, pushes down
past column pruning, and samples each parquet partition independently
on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dragnet_spark.ops.text import shingle_hash, shingle_hash_sql

_HASH_SPACE = 1 << 28  # shingle_hash is a 28-bit value


def hash_fraction(col: Column | str, salt: str = "") -> Column:
    """Uniform [0,1) value derived deterministically from a key column.
    ``salt`` decouples independent decisions on the same key (e.g. the
    split draw and a downsample draw must not correlate)."""
    c = F.col(col) if isinstance(col, str) else col
    key = F.concat(F.lit(salt), c.cast("string"))
    return shingle_hash(key) / F.lit(float(_HASH_SPACE))


def hash_fraction_sql(expr: str, salt: str = "") -> str:
    h = shingle_hash_sql(f"'{salt}' || CAST({expr} AS STRING)")
    return f"({h} / {float(_HASH_SPACE)})"


def hash_split(
    df: DataFrame,
    id_col: str,
    test_frac: float = 0.1,
    val_frac: float = 0.0,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column: 'test' for the first ``test_frac`` of
    hash space, then 'val' for the next ``val_frac``, 'train' for the
    rest. Membership is a pure function of the id — stable when the
    corpus grows, which is what prevents train/test leakage across
    dataset versions."""
    frac = hash_fraction(id_col, salt)
    split = (
        F.when(frac < test_frac, F.lit("test"))
        .when(frac < test_frac + val_frac, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def hash_split_sql(
    id_expr: str, test_frac: float = 0.1, val_frac: float = 0.0,
    salt: str = "split",
) -> str:
    frac = hash_fraction_sql(id_expr, salt)
    return (
        f"CASE WHEN {frac} < {test_frac} THEN 'test' "
        f"WHEN {frac} < {test_frac + val_frac} THEN 'val' "
        f"ELSE 'train' END"
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    strata_col: str,
    default_frac: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsample: keep a row iff its hash
    fraction is below its stratum's rate. The per-stratum rates are the
    standard rebalancing knob (e.g. keep 100% of low-resource languages,
    3% of crawl boilerplate). No shuffle; rates live in the filter
    expression, not a join."""
    frac = hash_fraction(id_col, salt)
    rate = F.lit(default_frac)
    for value, p in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(rate)
    return df.filter(frac < rate)


def stratified_sample_sql(
    id_expr: str,
    fractions: dict[str, float],
    strata_expr: str,
    default_frac: float = 0.0,
    salt: str = "sample",
) -> str:
    """WHERE-clause twin of stratified_sample."""
    frac = hash_fraction_sql(id_expr, salt)
    rate = str(default_frac)
    for value, p in sorted(fractions.items()):
        rate = f"CASE WHEN {strata_expr} = '{value}' THEN {p} ELSE {rate} END"
    return f"{frac} < {rate}"


# ----------------------------------------- cross-split contamination


def cross_split_contamination(
    df: DataFrame,
    text_col: str,
    id_col: str,
    test_frac: float = 0.1,
    val_frac: float = 0.0,
    salt: str = "split",
    ngram: int = 3,
    min_shared: int = 3,
    max_df: int = 20,
) -> DataFrame:
    """Train/test leakage report: (test_doc, train_doc, n_shared) pairs
    where a test-split document shares >= min_shared rare n-gram
    shingles with a train-split document.

    Exact-duplicate leakage checks miss the common real-world case —
    near-duplicates that straddle the split — so this uses the shared-
    rare-shingle signal (the winnowing discipline): shingles with
    document frequency > max_df are dropped *before* the self-join,
    which bounds the join fanout per shingle to max_df² instead of
    letting a stopword run produce a corpus-sized bucket. The join
    carries only (shingle, id, split); text never rides the shuffle.

    The input is spread() first: shingle md5-hashing is the CPU cost,
    and a few large input files would otherwise serialize it on a few
    cores (measured 5x on a single-file local input).
    """
    from pyspark.sql import Window as W

    from dragnet_spark.ops import spread
    from dragnet_spark.ops.dedup import _materialize_once
    from dragnet_spark.ops.text import shingles

    tagged = hash_split(spread(df), id_col, test_frac, val_frac, salt)
    ex = tagged.select(
        F.col(id_col).alias("id"),
        F.col("split"),
        F.explode(F.array_distinct(shingles(text_col, ngram))).alias("sh"),
    )
    # df-cap via a count window over sh rather than groupBy+join-back
    # (duplicate_spans' discipline): the join form re-embeds — i.e.
    # re-scans and re-shingles — the exploded lineage once per
    # reference, and with the test/train branches that was FOUR
    # shingle passes (measured r14). The window shuffles the skinny
    # (id, split, sh) rows by sh once and filters in place. A
    # stop-shingle's window partition is counted then dropped —
    # bounded by the same shuffle the join form already paid.
    fex = (
        ex.withColumn(
            "df", F.count(F.lit(1)).over(W.partitionBy("sh"))
        )
        .filter(F.col("df") <= max_df)
        .select("sh", "split", "id")
    )
    # the rare-only survivor table is tiny (every shingle df <= max_df)
    # and is referenced by both sides of the self-join below — one
    # checkpoint, two cheap reads
    fex = _materialize_once(fex)
    test = fex.filter(F.col("split") == "test").select(
        "sh", F.col("id").alias("test_doc")
    )
    train = fex.filter(F.col("split") == "train").select(
        "sh", F.col("id").alias("train_doc")
    )
    return (
        test.join(train, "sh")
        .groupBy("test_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def cross_split_contamination_sql(
    text_expr: str,
    test_frac: float = 0.1,
    val_frac: float = 0.0,
    salt: str = "split",
    ngram: int = 3,
    min_shared: int = 3,
    max_df: int = 20,
) -> str:
    """DuckDB twin of cross_split_contamination over documents."""
    from dragnet_spark.ops.text import shingles_sql

    return f"""
    WITH ex AS (
      SELECT doc_id AS id,
             {hash_split_sql('doc_id', test_frac, val_frac, salt)} AS split,
             s.sh
      FROM documents,
           UNNEST(list_distinct({shingles_sql(text_expr, ngram)})) AS s(sh)
    ),
    rare AS (SELECT sh FROM ex GROUP BY sh HAVING COUNT(*) <= {max_df}),
    fex AS (SELECT ex.* FROM ex JOIN rare USING (sh))
    SELECT a.id AS test_doc, b.id AS train_doc, COUNT(*) AS n_shared
    FROM fex a JOIN fex b ON a.sh = b.sh AND a.split = 'test' AND b.split = 'train'
    GROUP BY a.id, b.id
    HAVING COUNT(*) >= {min_shared}
    """
