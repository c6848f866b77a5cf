#!/usr/bin/env python
"""100× octave benchmark (VERDICT r8 #1 "graded BENCH_SF100 rows for
text/embedding families"): run a per-family representative subset of
the registry against the regenerated ``testdata_sf100`` tier
(60M lineitem, 10M events, 500k documents, 200k embeddings — Zipf
customer head, salted documents, signed-permutation embeddings) and
record timings plus the executed-plan safety bits (broadcast/SMJ
demotion, skew split, and the BNLJ/cartesian ban) to
``BENCH_SF100.json``.

Subset rationale (each family's heaviest feasible representative —
the all-pairs oracle baselines are excluded here for the same
documented reason they carry CHECK_SKIP entries in the 100×
correctness sweep: their COST is Ω(n²) by declared contract):

* tpch:  q1 (6-col agg over 60M), q18 (group-filter-join, AQE skew),
         q21 (4-way join + anti/semi)
* events: skew-proof distinct users at 10M rows (salted two-phase)
* text:  token stats ((doc,token) explode over 500k docs),
         minhash LSH dedup (band shuffle, candidates-only verify)
* embeddings: brute-force cosine top-k over all 200k vectors
         (broadcast query side), IVF probe, materialized-index probe
* multimodal: EXCLUDED — codec-bound pure map (embarrassingly
         parallel, no shuffle to grade; sf0.1 bench covers the codec)

Usage: python tools/bench_sf100.py [OUT_JSON] (default BENCH_SF100.json)
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

SF_DIR = os.environ.get(
    "SPARK_GRAFT_SF100_DIR",
    str(Path(__file__).resolve().parent.parent / "testdata_sf100"),
)

SUBSET = [
    "q1_pricing_summary",
    "q18_large_volume_orders",
    "q21_waiting_suppliers",
    "events_distinct_users_by_type",
    "text_token_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_cosine_topk_blocked",
    "ann_ivf_topk",
    "ann_vector_index_topk",
    "embedding_label_outliers",
    # round-9: iterative exact k-means over all 200k vectors (the
    # SemDeDup clustering stage; prune itself is cluster-quadratic by
    # contract at fixed k and carries a CHECK_SKIP like the all-pairs
    # baselines)
    "semdedup_kmeans",
]


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
        Path(__file__).resolve().parent.parent / "BENCH_SF100.json"
    )
    meta_p = Path(SF_DIR) / "_gen_meta.json"
    meta = json.loads(meta_p.read_text()) if meta_p.exists() else {}
    spark = get_spark(app_name="bench_sf100")
    qs = registry.queries()
    timings, plans, errors = {}, {}, {}
    for name in SUBSET:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            n = df.count() if not df.isStreaming else None
            timings[name] = round(time.time() - t0, 3)
            # executed plan AFTER the action: AQE's isFinalPlan bits
            plans[name] = plan_bits(df)
            plans[name]["rows"] = n
        except Exception as exc:  # noqa: BLE001 — record, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(
            f"{name}: {timings.get(name, 'ERR')}s",
            file=sys.stderr,
        )
    out = {
        "metric": "sf100_subset_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": "sf100 (100x facts, zipf, gen_version="
              f"{meta.get('gen_version')})",
        "plans": plans,
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
