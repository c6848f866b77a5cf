#!/usr/bin/env python
"""Octave-scale ingest-loop equivalence (VERDICT r13 #5): the central
invariant of the store-amortized posture is that building a store on
corpus A, APPENDING corpus B, and discovering pairs equals the
one-shot batch run over A∪B. `dn band-append` is unit-tested for
this at toy scale; this tool asserts PAIR-SET EQUALITY at sf1000
(5M docs / 2M vectors, split in half by id parity) for both
families and writes APPEND_EQUIVALENCE_SF1000.json:

  minhash — build_band_store(A) → append_band_keys(B) →
            band_store_pairs over A∪B   ==  minhash_lsh_pairs(A∪B)
  srp     — build_srp_store(A, width sized for the FULL corpus — the
            store's band width is immutable, so production sizes it
            for the ingest target, exactly what the 10⁵ ladder does)
            → append_srp_keys(B) → srp_store_pairs over A∪B
            ==  embedding_near_dup_lsh_autobits(A∪B)

Equality is exact full-row (ids + score): counts both sides plus
both exceptAll directions — zero rows each way or the artifact says
which way leaked.

Usage: python tools/check_append_equivalence.py [SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / "testdata_sf1000"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else str(
        ROOT / "APPEND_EQUIVALENCE_SF1000.json"
    )
    from pyspark.sql import functions as F

    from dragnet_spark.index.fingerprints import (
        append_band_keys,
        append_srp_keys,
        band_store_pairs,
        build_band_store,
        build_srp_store,
        srp_store_pairs,
    )
    from dragnet_spark.ops.dedup import (
        auto_srp_width,
        embedding_near_dup_lsh_autobits,
        minhash_lsh_pairs,
    )
    from dragnet_spark.registry.curation import (
        _EMB_LSH_BANDS,
        _EMB_LSH_DIMS,
        _EMB_LSH_T,
        _JACCARD_T,
        _NGRAM,
    )
    from dragnet_spark.session import get_spark

    spark = get_spark(app_name="check_append_equivalence")
    rec: dict = {"sf_dir": sf_dir, "families": {}}

    def compare(store_df, batch_df, cols, spans):
        """Full-row equality plus the count of pairs SPANNING the A/B
        split — the rows that would be missing if append were broken,
        so a nonzero count is what makes 'equal' a real test."""
        a = store_df.select(*cols)
        b = batch_df.select(*cols)
        n_store, n_batch = a.count(), b.count()
        extra = a.exceptAll(b).count()
        missing = b.exceptAll(a).count()
        n_span = a.filter(spans).count()
        return {
            "n_pairs_from_store": n_store,
            "n_pairs_one_shot": n_batch,
            "n_pairs_spanning_split": n_span,
            "pairs_only_in_store": extra,
            "pairs_only_in_one_shot": missing,
            "equal": n_store == n_batch and extra == 0 and missing == 0,
        }

    # ---------------- minhash -------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a_docs = docs.filter(F.col("doc_id") % 2 == 0)
    b_docs = docs.filter(F.col("doc_id") % 2 == 1)
    path = tempfile.mkdtemp(prefix="append_eq_band_")
    fam: dict = {}
    t0 = time.time()
    build_band_store(
        spark, a_docs, path, num_hashes=16, bands=8, ngram=_NGRAM
    )
    fam["build_A_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    append_band_keys(spark, b_docs, path)
    fam["append_B_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    from_store = band_store_pairs(spark, path, docs, threshold=_JACCARD_T)
    one_shot = minhash_lsh_pairs(
        docs, "text", "doc_id",
        num_hashes=16, bands=8, threshold=_JACCARD_T, ngram=_NGRAM,
    )
    fam.update(compare(
        from_store, one_shot, ["id_a", "id_b", "jaccard"],
        (F.col("id_a") % 2) != (F.col("id_b") % 2),
    ))
    fam["compare_s"] = round(time.time() - t0, 1)
    rec["families"]["minhash_band_append"] = fam
    shutil.rmtree(path, ignore_errors=True)
    print("minhash:", json.dumps(fam))

    # ---------------- srp -----------------------------------------
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # A = base corpus, B = planted twins (+_TWIN_SHIFT, the registry
    # entries' construction) — EVERY twin pair spans the split, so a
    # broken append cannot pass
    from dragnet_spark.registry.curation import _TWIN_SHIFT

    a_emb = base
    b_emb = base.select(
        (F.col("vec_id") + _TWIN_SHIFT).alias("vec_id"),
        F.col("embedding"),
    )
    emb = a_emb.unionByName(b_emb)
    n_total = emb.count()
    bits, planes = auto_srp_width(n_total, _EMB_LSH_BANDS, _EMB_LSH_DIMS, 42)
    path = tempfile.mkdtemp(prefix="append_eq_srp_")
    fam = {"bits": bits, "n_vectors": n_total}
    t0 = time.time()
    build_srp_store(
        spark, a_emb, path,
        vec_col="embedding", id_col="vec_id",
        bands=_EMB_LSH_BANDS, bits_per_band=bits, seed=42,
        dims=_EMB_LSH_DIMS,
        planes_q=planes,
        with_pairs=False,
    )
    fam["build_A_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    append_srp_keys(spark, b_emb, path)
    fam["append_B_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    from_store = srp_store_pairs(spark, path, emb, threshold=_EMB_LSH_T)
    one_shot = embedding_near_dup_lsh_autobits(
        emb, threshold=_EMB_LSH_T, dims=_EMB_LSH_DIMS, bands=_EMB_LSH_BANDS
    )
    fam.update(compare(
        from_store, one_shot, ["id_a", "id_b", "cosine"],
        (F.col("id_a") < _TWIN_SHIFT) & (F.col("id_b") >= _TWIN_SHIFT),
    ))
    fam["compare_s"] = round(time.time() - t0, 1)
    rec["families"]["srp_append"] = fam
    shutil.rmtree(path, ignore_errors=True)
    print("srp:", json.dumps(fam))

    rec["all_equal"] = all(
        f.get("equal") for f in rec["families"].values()
    )
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"all_equal": rec["all_equal"], "out": out_json}))


if __name__ == "__main__":
    main()
