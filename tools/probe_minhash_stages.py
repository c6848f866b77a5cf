#!/usr/bin/env python
"""Decompose dedup_minhash_lsh's wall at a tier into its three stages
(VERDICT r10 #5: attribute the sf1000 factor 8.7 — 196 s on 10× the
documents): signature build (shingle explode + 16-permutation min
agg), band shuffle + candidate dedup, and exact-Jaccard verify (token
sets joined back onto deduplicated candidates).

Stages are CUMULATIVE runs of the registry construction's prefixes
(each prefix re-executes its predecessors — Spark has no free
mid-plan timer), so per-stage attribution is successive differences:
sig = t_sig, band = t_cand − t_sig, verify = t_full − t_cand. Each
prefix is the exact subplan of dedup_minhash_lsh (same params:
16 hashes, 8 bands, threshold/ngram from the registry).

Usage: python tools/probe_minhash_stages.py [SF_DIR]
       (default testdata_sf1000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.ops import spread  # noqa: E402
from dragnet_spark.ops.dedup import _jaccard, token_sets  # noqa: E402
from dragnet_spark.ops.text import (  # noqa: E402
    MINHASH_P,
    minhash_coeffs,
    shingle_hash,
    shingles,
)
from dragnet_spark.registry._base import _t  # noqa: E402
from dragnet_spark.registry.curation import _JACCARD_T, _NGRAM  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402

NUM_HASHES, BANDS = 16, 8


def _stages(spark, sf_dir):
    r = NUM_HASHES // BANDS
    df = spread(_t(spark, sf_dir, "documents"))
    ex = df.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(shingles("text", _NGRAM))).alias("sh"),
    )
    h = shingle_hash(F.col("sh"))
    base = ex.groupBy("id").agg(
        *[
            F.min((F.lit(a) * h + F.lit(b)) % MINHASH_P).alias(f"__m{i}")
            for i, (a, b) in enumerate(minhash_coeffs(NUM_HASHES))
        ]
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.md5(
                    F.concat_ws(
                        "\x1f", *[F.col(f"__m{i * r + j}") for j in range(r)]
                    )
                ).alias("bhash"),
            )
            for i in range(BANDS)
        ]
    )
    banded = base.select("id", F.explode(band_arr).alias("b")).select(
        "id", F.col("b.band").alias("band"), F.col("b.bhash").alias("bhash")
    )
    left = banded.select("band", "bhash", F.col("id").alias("id_a"))
    right = banded.select("band", "bhash", F.col("id").alias("id_b"))
    candidates = (
        left.join(right, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sets = token_sets(df, "text", "doc_id", _NGRAM)
    with_sets = candidates.join(
        sets.select(F.col("id").alias("id_a"), F.col("tset").alias("ts_a")),
        "id_a",
    ).join(
        sets.select(F.col("id").alias("id_b"), F.col("tset").alias("ts_b")),
        "id_b",
    )
    full = (
        with_sets.withColumn("jaccard", _jaccard(F.col("ts_a"), F.col("ts_b")))
        .filter(F.col("jaccard") >= _JACCARD_T)
        .select("id_a", "id_b", "jaccard")
    )
    return base, candidates, full


def main() -> None:
    root = Path(__file__).resolve().parent.parent
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(root / "testdata_sf1000")
    spark = get_spark(app_name="probe_minhash_stages")
    base, candidates, full = _stages(spark, sf_dir)
    # warm the input file listing/footers so stage A isn't charged
    # first-touch costs the other prefixes don't pay
    _ = _t(spark, sf_dir, "documents").count()
    t0 = time.time()
    n_sig = base.count()
    t_sig = round(time.time() - t0, 2)
    t0 = time.time()
    n_cand = candidates.count()
    t_cand = round(time.time() - t0, 2)
    t0 = time.time()
    n_pairs = full.count()
    t_full = round(time.time() - t0, 2)
    out = {
        "sf_dir": sf_dir,
        "n_docs_signed": n_sig,
        "n_candidates": n_cand,
        "n_verified_pairs": n_pairs,
        "t_signature_s": t_sig,
        "t_through_candidates_s": t_cand,
        "t_full_s": t_full,
        "attributed": {
            "signature_build": t_sig,
            "band_shuffle_and_dedup": round(t_cand - t_sig, 2),
            "verify_join": round(t_full - t_cand, 2),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
