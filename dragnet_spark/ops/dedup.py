"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Designed for the 100 TB regime:

* **exact** — one hash-groupBy shuffle keyed on the fingerprint;
  partial aggregation means the shuffle carries unique digests.
* **MinHash-LSH** — signatures are per-row expressions (no shuffle);
  candidate generation explodes each row into `bands` rows and
  self-joins on (band, band_hash) — a shuffle whose keys are hash
  buckets, so it parallelizes and AQE handles skewed buckets; exact
  Jaccard verification touches only candidate pairs, never the O(n²)
  cross product.
* **n-gram Jaccard** — exact pairwise similarity, gated behind the
  LSH prefilter (the un-prefiltered variant exists for small inputs
  and oracle checks).
* **SimHash** — 64-bit signature via xxhash64 (JVM hash; no SQL twin,
  so its registry entry is a rows-only check).

All outputs order pairs as id_a < id_b to keep results canonical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from dragnet_spark.ops.text import fingerprint, minhash_signature, tokens


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group rows by normalized-text fingerprint: (fingerprint, keep_id,
    n_dupes). keep_id is the smallest id in the group (the canonical
    survivor); n_dupes counts group size."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def token_sets(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens(text_col)).alias("tset"),
    )


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.round(inter / union, 6)


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.8
) -> DataFrame:
    """Exact all-pairs token-set Jaccard ≥ threshold. O(n²) — use only
    on small/pre-blocked inputs; the scale path is minhash_lsh_pairs."""
    a = token_sets(df, text_col, id_col).select(
        F.col("id").alias("id_a"), F.col("tset").alias("ts_a")
    )
    b = token_sets(df, text_col, id_col).select(
        F.col("id").alias("id_b"), F.col("tset").alias("ts_b")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", _jaccard(F.col("ts_a"), F.col("ts_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, then exact-Jaccard
    verification of candidates only.

    rows-per-band r = num_hashes/bands; a pair collides in some band
    with probability 1-(1-j^r)^bands. Band hash is md5 over the band's
    signature slice.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands

    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens(text_col)).alias("tset"),
        minhash_signature(text_col, num_hashes).alias("sig"),
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.md5(
                    F.concat_ws("\x1f", *[F.col("sig")[i * r + j] for j in range(r)])
                ).alias("bhash"),
            )
            for i in range(bands)
        ]
    )
    banded = base.select("id", "tset", F.explode(band_arr).alias("b")).select(
        "id", "tset", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash")
    )

    left = banded.select(
        F.col("band"), F.col("bhash"), F.col("id").alias("id_a"), F.col("tset").alias("ts_a")
    )
    right = banded.select(
        F.col("band"), F.col("bhash"), F.col("id").alias("id_b"), F.col("tset").alias("ts_b")
    )
    candidates = (
        left.join(right, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ts_a", "ts_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        candidates.withColumn("jaccard", _jaccard(F.col("ts_a"), F.col("ts_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_keep_first(pairs: DataFrame, df: DataFrame, id_col: str) -> DataFrame:
    """Survivor set: drop any row that appears as the larger id of a
    duplicate pair (single-pass approximation of connected-component
    dedup — keeps at least one row per duplicate cluster)."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def simhash64(col: Column | str, num_tokens_bits: int = 64) -> Column:
    """64-bit SimHash over the token multiset: for each bit b, sum
    (+1/-1) of token-hash bit b across tokens; bit b of the signature
    is 1 when the sum is positive. Pure built-in expressions via
    xxhash64 + bitwise ops (JVM-side; no portable SQL twin).
    """
    toks = tokens(col)
    # per-bit contribution: shiftright(hash,b)&1 ? +1 : -1, summed with
    # aggregate(); bits assembled with OR (no arithmetic overflow)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_contrib(b: int):
        # helper (not a default-arg lambda: pyspark requires exactly
        # two lambda parameters for aggregate's merge function)
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for b in range(num_tokens_bits):
        contrib = bit_contrib(b)
        bit = F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(F.shiftleft(bit, b))
    return out


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash64 values."""
    return F.bit_count(a.bitwiseXOR(b))
