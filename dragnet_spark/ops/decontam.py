"""Bloom-prefiltered benchmark decontamination — the 100 TB scale path.

:func:`ops.text.benchmark_overlap` broadcasts the eval set's distinct
gram-hash table to probe every training gram. That is the right plan
while the eval set is small, but a real decontamination run screens
against every published benchmark at once — easily 10⁸ distinct
grams, a multi-GB broadcast. The scale path here replaces that
broadcast with a fixed-size packed Bloom bitset (~10 bits per eval
gram) and demotes the exact gram table to one side of an ordinary
shuffle join that only *candidate* grams ever enter:

1. Build the bitset distributively: eval grams hash to ``k`` bit
   positions JVM-side (``xxhash64(gh, seed)``), each input partition
   ORs its positions into a local ``m/8``-byte array inside
   ``mapInPandas``, and the driver ORs the per-partition arrays —
   one small row per partition crosses the wire, never the grams.
2. Probe every training gram against the broadcast bitset with an
   Arrow-batched Pandas UDF (pure NumPy gather, no Python per row).
   Bloom filters have **no false negatives**, so a gram whose bits
   aren't all set is *certainly* clean and never enters the join.
3. Only might-contain grams (true hits + the fpp-bounded false
   positives) join the exact eval gram table to confirm — at target
   fpp that join is ~#true-hits-sized regardless of corpus size, so
   AQE is free to pick shuffle or broadcast.

The output is bit-identical to :func:`benchmark_overlap` (same
columns, same rounding), which is why the DuckDB oracle for this
entry is the *exact* SQL twin — the Bloom layer is provably
answer-preserving, and the oracle check enforces it every run.

No dragnet analog (the reference has no decontamination surface);
this is a beyond-reference LLM-pipeline operator, see SURVEY.md §6.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dragnet_spark.ops.text import doc_gram_hashes

#: default bitset size / hash count: 2^20 bits = 128 KiB handles
#: ~10^5 eval grams at fpp ≈ 0.6% with k=5. Size m ≈ 1.44 · n ·
#: log2(1/fpp) bits for a real run (2^30 bits = 128 MiB → 10^8 grams
#: at 1% — still one broadcast where the gram table would be ~6 GB).
DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 5


def _hash_pair(gh_col: str) -> list:
    """The two base hashes per gram, as JVM column exprs. Only these
    16 bytes per gram ever cross the JVM→Arrow boundary; the k bit
    positions are derived numpy-side (:func:`_positions_np`) with the
    Kirsch–Mitzenmacher double-hashing construction — a bloom built
    from (h1 + i·h2) mod m has the same asymptotic fpp as k
    independent hashes (Kirsch & Mitzenmacher, ESA 2006), and, like
    any bloom, no false negatives.
    """
    return [
        F.xxhash64(F.col(gh_col)).alias("h1"),
        F.xxhash64(F.col(gh_col), F.lit(1)).alias("h2"),
    ]


def _positions_np(h1, h2, m_bits: int, k: int):
    """(n, k) int64 bit positions from the two base hashes. uint64
    wraparound arithmetic, identical on build and probe — the only
    definition of the bitset layout."""
    h1 = h1.astype(np.uint64, copy=False)
    # force h2 odd so it is invertible mod the power-of-two m and the
    # k probes never collapse onto one position
    h2 = h2.astype(np.uint64, copy=False) | np.uint64(1)
    steps = np.arange(k, dtype=np.uint64)
    pos = (h1[:, None] + steps[None, :] * h2[:, None]) & np.uint64(
        m_bits - 1
    )
    return pos.astype(np.int64)


def bloom_build(
    gh_df: DataFrame,
    gh_col: str = "gh",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> bytes:
    """Aggregate a DataFrame of gram hashes into one packed Bloom
    bitset (little-endian bit order within each byte). ``m_bits``
    must be a power of two (the position derivation masks).

    Distributive build: each partition reduces to a single
    ``m_bits/8``-byte row; the driver ORs the per-partition rows.
    Driver traffic is ``num_partitions × m/8`` bytes — independent
    of the gram count. (At very large m, coalesce the position frame
    first or tree-OR in two rounds; at m = 2^30 and 1000 partitions
    that's a 128 GB collect without it.)
    """
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    nbytes = m_bits // 8
    hp = gh_df.select(*_hash_pair(gh_col))

    def _to_bits(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if len(pdf):
                seen = True
                p = _positions_np(
                    pdf["h1"].to_numpy(np.int64),
                    pdf["h2"].to_numpy(np.int64),
                    m_bits, k,
                ).ravel()
                # unbuffered |= so duplicate byte indices all land
                np.bitwise_or.at(
                    bits, p >> 3, (1 << (p & 7)).astype(np.uint8)
                )
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    out = np.zeros(nbytes, dtype=np.uint8)
    for row in hp.mapInPandas(_to_bits, "bits binary").collect():
        out |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out.tobytes()


def _with_might(
    grams: DataFrame, bitset: bytes, m_bits: int, k: int
) -> DataFrame:
    """``grams`` plus a boolean ``might`` column: whether the packed
    ``bitset`` has all k bits set for the gram — Arrow-batched numpy
    gather over the broadcast bitset, 16 bytes of hash per gram on
    the wire."""
    bits_b = grams.sparkSession.sparkContext.broadcast(bitset)

    @F.pandas_udf("boolean")
    def _might(h1: pd.Series, h2: pd.Series) -> pd.Series:
        if len(h1) == 0:
            return pd.Series([], dtype=bool)
        bits = np.frombuffer(bits_b.value, dtype=np.uint8)
        P = _positions_np(
            h1.to_numpy(np.int64), h2.to_numpy(np.int64), m_bits, k
        )
        hit = (bits[P >> 3] >> (P & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return grams.withColumn("might", _might(*_hash_pair("gh")))


def bloom_candidates(
    grams: DataFrame,
    bitset: bytes,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Filter a (…, gh) gram frame to the rows the ``bitset`` might
    contain — the fpp-bounded candidate sliver (true hits are all
    kept: no false negatives). Whatever joins this output downstream
    is ~true-hit-sized."""
    return _with_might(grams, bitset, m_bits, k).filter("might").drop(
        "might"
    )


def overlap_report(
    grams: DataFrame,
    bench: DataFrame,
    bitset: bytes,
    id_col: str = "doc_id",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Screen a (id_col, gh) gram frame against a packed Bloom
    ``bitset``; exactly verify might-contain grams against the
    distinct (gh) frame ``bench`` the bitset was built from. Returns
    (id_col, n_grams, n_hit_grams, hit_frac, contaminated) — the
    same columns and rounding as :func:`ops.text.benchmark_overlap`.
    """
    g = _with_might(grams, bitset, m_bits, k)
    # ONE pass over the training grams (r14: the old shape ran the
    # gram-assembly lineage twice — a per-doc totals branch and a
    # might-filtered verify branch — and Catalyst re-embeds the
    # explode+window pipeline per branch). Folding `might` into the
    # LEFT join's condition keeps the verify semantics (a gram only
    # matches when the bitset might-contains it AND it is in the exact
    # bench table — bench holds distinct ghs, so ≤ 1 match per gram)
    # while the same rows also carry the per-doc totals: one groupBy
    # computes n_grams and the hit sum together. Bench stays the
    # broadcast-or-shuffle side AQE sizes; might=false grams
    # contribute 0 hits without ever probing the hash relation.
    bj = bench.withColumn("__hit", F.lit(1)).alias("b")
    g = g.alias("g")
    per_doc = (
        g.join(
            bj,
            F.col("g.might") & (F.col("g.gh") == F.col("b.gh")),
            "left",
        )
        .groupBy(F.col(f"g.{id_col}").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_hit_grams"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_hit_grams",
        F.round(
            F.col("n_hit_grams").cast("double") / F.col("n_grams"), 9
        ).alias("hit_frac"),
        (F.col("n_hit_grams") > 0).cast("int").alias("contaminated"),
    )


def benchmark_overlap_bloom(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    bench_mod: int = 97,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Bit-identical to :func:`ops.text.benchmark_overlap`, computed
    via the Bloom prefilter: every training gram is screened against
    the broadcast bitset; only might-contain grams join the exact
    eval gram table. Columns: (id_col, n_grams, n_hit_grams,
    hit_frac, contaminated).
    """
    from dragnet_spark.ops.dedup import _materialize_once

    pos = doc_gram_hashes(df, text_col, id_col, n)
    is_bench = F.col(id_col) % bench_mod == 0
    # bench is consumed twice (the eager bitset build and the exact
    # verify join) and its lineage is a full corpus gram-assembly
    # pass; the distinct eval gram set is small by construction (the
    # held-out slice), so one checkpoint pays for itself immediately
    bench = _materialize_once(
        pos.filter(is_bench).select("gh").distinct()
    )
    train = pos.filter(~is_bench)
    bitset = bloom_build(bench, "gh", m_bits=m_bits, k=k)
    return overlap_report(
        train, bench, bitset, id_col=id_col, m_bits=m_bits, k=k
    )
