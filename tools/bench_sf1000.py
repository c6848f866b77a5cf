#!/usr/bin/env python
"""1000× curation-octave bench: ENGINE-ONLY timings + executed-plan
audits for the scale-path dedup/embedding/text families over the
partial 1000× tier (5M documents, 2M embeddings —
``tools/gen_sf1.py testdata_sf1000 --scale 1000 --tables
documents,embeddings``; fact tables deliberately absent, nobody
needs a 600M-row lineitem to grade a documents operator).

No DuckDB oracles at this tier — the single-box oracle recomputation
is the dominant cost of the 100× sweep already (SCALE.md "100× sweep
walls") and proves nothing new about the ENGINE; correctness is
pinned at four tiers below. What this tier shows is SHAPE: per-query
wall vs the 100× bench row (a linear-shaped operator lands near 10×
on 10× the documents), plus the plan-safety bits (no BNLJ/cartesian,
broadcast demotions where dims scaled).

Usage: python tools/bench_sf1000.py [OUT_JSON] (default BENCH_SF1000.json)
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dragnet_spark import registry  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF1000_DIR", str(ROOT / "testdata_sf1000"))

#: queries touching ONLY documents/embeddings, each family's declared
#: scale path. (name, 100x-bench row in seconds for the shape check)
SUBSET = [
    ("dedup_exact", None),
    ("text_token_stats", 3.741),
    ("dedup_minhash_lsh", 22.506),
    ("dedup_embedding_lsh_autobits", 36.316),
    ("semdedup_kmeans", 9.429),
    ("semdedup_prune", 45.804),
    ("corpus_vocab_kmv", 17.663),
]


def _emb_lsh_autobits(spark, sf_dir):
    """The dedup_embedding_lsh construction at the corpus-correct SRP
    band width (ops/dedup.auto_bits_per_band). The registry entry's
    pinned 16-bit bands are a 4-tier-graded constant with a corpus
    ceiling (~1M vectors for a 4-candidate/row budget): at THIS
    tier's 4M union vectors, 16 bits admits ~7e8 random collisions
    whose exact-verify join ships two vectors per pair — measured: it
    filled 76 GB of shuffle disk and died. The auto width (22 bits
    here) is the production posture; identical twins still collide in
    every band, so the found pair set is the same."""
    from pyspark.sql import functions as F

    from dragnet_spark.ops.dedup import (
        auto_bits_per_band,
        embedding_near_dup_lsh,
    )
    from dragnet_spark.registry._base import _t
    from dragnet_spark.registry.curation import (
        _EMB_LSH_BANDS,
        _EMB_LSH_DIMS,
        _EMB_LSH_T,
        _TWIN_SHIFT,
    )

    emb = _t(spark, sf_dir, "embeddings")
    twins = emb.select(
        (F.col("vec_id") + _TWIN_SHIFT).alias("vec_id"), F.col("embedding")
    )
    corpus = emb.select("vec_id", "embedding").unionByName(twins)
    n = corpus.count()
    bits = auto_bits_per_band(n, _EMB_LSH_BANDS)
    return embedding_near_dup_lsh(
        corpus,
        threshold=_EMB_LSH_T,
        dims=_EMB_LSH_DIMS,
        bits_per_band=bits,
        bands=_EMB_LSH_BANDS,
    )


CUSTOM = {"dedup_embedding_lsh_autobits": _emb_lsh_autobits}


def plan_bits(df) -> dict:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    return {
        "broadcast_joins": p.count("BroadcastHashJoin"),
        "smj": p.count("SortMergeJoin"),
        "skew": "isSkew=true" in p or "skewed=true" in p,
        "bnlj": "BroadcastNestedLoopJoin" in p,
        "cartesian": "CartesianProduct" in p,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / "BENCH_SF1000.json"
    )
    meta_p = Path(SF_DIR) / "_gen_meta.json"
    meta = json.loads(meta_p.read_text()) if meta_p.exists() else {}
    spark = get_spark(app_name="bench_sf1000")
    qs = registry.queries()
    timings, plans, errors, vs100 = {}, {}, {}, {}
    for name, t100 in SUBSET:
        t0 = time.time()
        try:
            fn = CUSTOM.get(name) or qs[name]
            df = fn(spark, SF_DIR)
            n = df.count()
            t = round(time.time() - t0, 3)
            timings[name] = t
            plans[name] = plan_bits(df)
            plans[name]["rows"] = n
            if t100:
                # 10x the 100x tier's documents/embeddings: a linear
                # operator lands near factor 10
                vs100[name] = round(t / t100, 2)
        except Exception as exc:  # noqa: BLE001 — record, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"{name}: {timings.get(name, 'ERR')}s", file=sys.stderr)
    out = {
        "metric": "sf1000_curation_subset_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "factor_vs_sf100_bench": vs100,
        "sf": "sf1000 partial (documents 5M, embeddings 2M, "
              f"gen_version={meta.get('gen_version')}, "
              f"tables={meta.get('tables_subset')})",
        "plans": plans,
        "note": "engine-only (no oracle at this tier; correctness is "
                "pinned at sf0.01/0.1/10x/100x) — this tier grades "
                "SHAPE: factor ~10 = linear, and plan safety",
    }
    if errors:
        out["errors"] = errors
    banned = [
        n for n, p in plans.items() if p.get("bnlj") or p.get("cartesian")
    ]
    out["banned_plan_shapes"] = banned
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "plans"}))
    sys.exit(1 if (errors or banned) else 0)


if __name__ == "__main__":
    main()
