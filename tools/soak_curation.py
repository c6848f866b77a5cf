#!/usr/bin/env python
"""Curation-family scaling soak: replicate the sf0.1 corpus K× and
measure how the training-data-pipeline operators scale with corpus
size — the measured counterpart of SCALE.md's design claims.

Replication that doesn't distort the answer:

* documents — each replica's tokens are remapped through
  ``md5(token || replica)`` (a per-replica bijection), so replicas are
  textually unrelated to each other while every replica preserves the
  original within-corpus duplicate structure exactly. Naive copying
  would make every doc a near-dup of its K-1 clones and blow the LSH
  pair count up by K² — measuring the distortion, not the operator.
* embeddings — each replica multiplies the vector by a
  replica-specific ±1 sign pattern (an isometry), so within-replica
  cosine structure is preserved but cross-replica cosines collapse
  toward 0 and the near-dup pair count scales linearly in K.

Usage: python tools/soak_curation.py [K1,K2,...] [op1,op2,...]
(default K=1,4,16, all ops). Prints one JSON line per K and a final
summary line with the t(K_max)/t(K_min) scaling ratios (linear would
be K_max/K_min).

ANN rows (round-5): the corpus side replicates K×, the QUERY side
stays fixed (64 vectors) — the production shape where a bounded query
batch probes an ever-growing corpus. Replica sign-masks make replicas
near-orthogonal, so top-k stays dominated by within-replica
neighbors and the answer's structure is K-invariant. Each K also
asserts the broadcast cap: a query side over max_queries must raise,
not OOM the driver.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from dragnet_spark.ops import dedup as _dedup  # noqa: E402
from dragnet_spark.ops import similarity as _sim  # noqa: E402
from dragnet_spark.ops import text as _text  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.sources.tables import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
ID_SHIFT = 10_000_000


def replicate_documents(docs: DataFrame, k: int) -> DataFrame:
    out = None
    for r in range(k):
        if r == 0:
            part = docs.select("doc_id", "text")
        else:
            remapped = F.array_join(
                F.transform(
                    _text.tokens("text"),
                    lambda t: F.substring(
                        F.md5(F.concat(t, F.lit(f"|r{r}"))), 1, 6
                    ),
                ),
                " ",
            )
            part = docs.select(
                (F.col("doc_id") + F.lit(r * ID_SHIFT)).alias("doc_id"),
                remapped.alias("text"),
            )
        out = part if out is None else out.unionByName(part)
    return out


def embedding_replica(emb: DataFrame, r: int) -> DataFrame:
    """ONE replica (replica 0 = the original): the ±1 sign-mask
    isometry applied directly, so callers appending replica-by-replica
    pay one scan per batch instead of building and discarding an
    (r+1)-way union (tools/soak_vindex.py's append loop was O(K²)
    replica scans before this)."""
    if r == 0:
        return emb.select("vec_id", "embedding")
    # independent random ±1 mask per replica (seeded): same-doc
    # cross-replica cosine concentrates near 0, so pair counts
    # scale linearly in K instead of K²
    import random as _random

    mrng = _random.Random(1000 + r)
    mask = [float(mrng.choice((1.0, -1.0))) for _ in range(64)]
    flipped = F.zip_with(
        F.col("embedding"),
        F.array(*[F.lit(m) for m in mask]),
        lambda x, m: x * m,
    )
    return emb.select(
        (F.col("vec_id") + F.lit(r * ID_SHIFT)).alias("vec_id"),
        flipped.cast("array<float>").alias("embedding"),
    )


def replicate_embeddings(emb: DataFrame, k: int) -> DataFrame:
    out = None
    for r in range(k):
        part = embedding_replica(emb, r)
        out = part if out is None else out.unionByName(part)
    return out


def timed(fn) -> tuple[float, int]:
    t0 = time.time()
    n = fn()
    return round(time.time() - t0, 2), n


def main() -> None:
    ks = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["1", "4", "16"])]
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(app_name="soak_curation")
    docs0 = load_table(spark, SF_DIR, "documents")
    emb0 = load_table(spark, SF_DIR, "embeddings")
    # fixed ANN query side: the corpus grows, the query batch doesn't
    fixed_q = emb0.limit(64).cache()
    fixed_q.count()
    results = {}
    for k in ks:
        docs = replicate_documents(docs0, k)
        emb = replicate_embeddings(emb0, k)
        n_docs = docs.count()
        row = {"k": k, "n_docs": n_docs}

        _vpath: list = []

        def _vindex_build() -> int:
            import tempfile

            from dragnet_spark.index.vector import build_vector_index

            path = tempfile.mkdtemp(prefix="dragnet_soak_vidx_")
            build_vector_index(spark, emb, path, n_centroids=16)
            _vpath.append(path)
            return emb.count()

        def _vindex_probe() -> int:
            from dragnet_spark.index.vector import query_vector_index

            return query_vector_index(
                spark, _vpath[-1], fixed_q, k=5, n_probe=4
            ).count()

        def _ann_cap_enforced() -> int:
            try:
                _sim.cosine_topk_blocked(
                    emb, emb.limit(40), k=1, max_queries=32
                ).count()
            except ValueError:
                return 1
            return 0

        ops = {
            "exact_dedup": lambda: _dedup.exact_dup_groups(
                docs, "text", "doc_id"
            ).count(),
            "minhash_lsh": lambda: _dedup.minhash_lsh_pairs(
                docs, "text", "doc_id"
            ).count(),
            "duplicate_spans": lambda: _text.duplicate_spans(docs).count(),
            "repetition_stats": lambda: _text.repetition_stats(docs).count(),
            "unigram_logprob": lambda: _text.unigram_logprob(docs).count(),
            "decontam": lambda: _text.benchmark_overlap(docs).count(),
            # registry-grade signature width (96 bits): 4-bit bands on
            # near-orthogonal vectors put ~n/16 ids in every bucket and
            # measure the candidate blow-up, not the operator
            "embedding_lsh": lambda: _dedup.embedding_near_dup_lsh(
                emb,
                dims=emb0.select(F.size("embedding")).first()[0],
                bits_per_band=16,
                bands=6,
            ).count(),
            # ANN: K-growing corpus against the FIXED 64-query batch
            "ann_blocked": lambda: _sim.cosine_topk_blocked(
                emb, fixed_q, k=5
            ).count(),
            "ann_ivf": lambda: _sim.ivf_topk(
                emb, fixed_q, k=5, n_centroids=16, n_probe=4
            ).count(),
            "ann_cap_enforced": _ann_cap_enforced,
            # materialized IVF index: build once per K, then a pruned
            # probe of the FIXED query batch — probe cost should track
            # n_probe/n_centroids of the index, not the whole corpus
            "ann_index_build": lambda: _vindex_build(),
            "ann_index_probe": lambda: _vindex_probe(),
        }
        for name, fn in ops.items():
            if only is not None and name not in only:
                continue
            dt, n = timed(fn)
            row[name] = {"sec": dt, "out_rows": n}
        results[k] = row
        print(json.dumps(row), flush=True)
    if len(ks) > 1:
        lo, hi = min(ks), max(ks)
        ratios = {
            name: round(
                results[hi][name]["sec"] / max(results[lo][name]["sec"], 1e-9), 2
            )
            for name in results[lo]
            if isinstance(results[lo][name], dict)
        }
        print(
            json.dumps(
                {
                    "scaling": ratios,
                    "k_ratio": hi // lo,
                    "note": "sec(K_max)/sec(K_min); linear scaling would "
                    f"equal {hi // lo}, sublinear is fixed-overhead "
                    "amortization",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
