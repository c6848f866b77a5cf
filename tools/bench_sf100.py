#!/usr/bin/env python
"""100× octave benchmark, BANDED (VERDICT r9 #4): run a per-family
representative subset of the registry against the regenerated
``testdata_sf100`` tier (60M lineitem, 10M events, 500k documents,
200k embeddings — Zipf customer head, salted documents,
signed-permutation embeddings), grade each query against its
trailing-median history band (the same 1.2× discipline bench.py
applies at sf0.1), and record timings plus the executed-plan safety
bits (broadcast/SMJ demotion, skew split, BNLJ/cartesian ban) to
``BENCH_SF100.json``. Per-query history accumulates in
``BENCH_SF100_HISTORY.jsonl`` with a ``round`` stamp; a first run
seeds the history from the last committed BENCH_SF100.json so the
banding starts from round 9's honest numbers.

Subset rationale (each family's heaviest feasible representative —
the all-pairs oracle baselines are excluded here for the same
documented reason they carry CHECK_SKIP entries in the 100×
correctness sweep: their COST is Ω(n²) by declared contract):

* tpch:  q1 (6-col agg over 60M), q18 (group-filter-join, AQE skew),
         q21 (4-way join + anti/semi)
* events: skew-proof distinct users at 10M rows (salted two-phase)
* text:  token stats ((doc,token) explode over 500k docs),
         minhash LSH dedup (band shuffle, candidates-only verify),
         prefix-filtered Jaccard, KMV vocabulary census,
         bloom-prefiltered decontamination
* embeddings: brute-force cosine top-k over all 200k vectors
         (broadcast query side), IVF probe, materialized-index probe,
         SRP-LSH near-dup + its closure clusters, SemDeDup k-means +
         auto-k prune
* graph: PageRank + triangle counts over the near-dup graph
* multimodal: MJPEG-in-AVI frame decode (codec fan-out; the one
         multimodal row with enough work at 100× to be worth a band)

Timing notes: ``ann_ivf_topk`` includes its IN-QUERY centroid build
every run (the materialized ``index/vector.py`` path is the
production probe and is separately graded) — its row overstates
steady-state probe cost by the build. Store-backed probes time the
probe only (builds amortize; see bench.py STORE_BACKED_PROBE_ONLY).

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

ROOT = Path(__file__).resolve().parent.parent
SF_DIR = os.environ.get("SPARK_GRAFT_SF100_DIR", str(ROOT / "testdata_sf100"))
HISTORY = ROOT / "BENCH_SF100_HISTORY.jsonl"

SUBSET = [
    "q1_pricing_summary",
    "q18_large_volume_orders",
    "q21_waiting_suppliers",
    "events_distinct_users_by_type",
    "text_token_stats",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_cosine_topk_blocked",
    "ann_ivf_topk",  # includes its in-query centroid build (see module doc)
    "ann_vector_index_topk",
    "embedding_label_outliers",
    "semdedup_kmeans",
    # round-10 additions: the families whose 100× skips were retired
    # this round, plus the graph + text + codec representatives that
    # previously had correctness rows but no graded bench row
    "semdedup_prune",
    "dedup_embedding_lsh",
    "dedup_embedding_clusters_lsh",
    "dedup_jaccard_prefix",
    "docs_neardup_pagerank",
    "docs_neardup_triangles",
    "corpus_vocab_kmv",
    "decontam_bloom_prefilter",
    "multimodal_video_frames",
    # round-11 additions: the two scale forms the 1000x tier forced
    # into existence, now registry-graded — their sf100 rows are the
    # factor denominators bench_sf1000 reads from BENCH_SF100.json
    "semdedup_prune_two_level",
    "dedup_embedding_lsh_autobits",
]

#: same committed-artifact band as bench.py at sf0.1
GRADE_BAND = 1.2
TRAILING_K = 8
MAX_GRADE_PASSES = 2


def current_round() -> int:
    sys.path.insert(0, str(ROOT))
    import bench

    return bench.current_round()


def _seed_history_if_absent() -> None:
    """First banded run: seed per-query history from the last
    committed BENCH_SF100.json (round 9's honest 175.7 s numbers), so
    grading starts from measured history instead of an empty band."""
    if HISTORY.exists():
        return
    prev = ROOT / "BENCH_SF100.json"
    if not prev.exists():
        return
    try:
        rec = json.loads(prev.read_text())
    except json.JSONDecodeError:
        return
    if not rec.get("queries"):
        return
    with HISTORY.open("w") as f:
        f.write(json.dumps({
            "ts": None,
            "round": 9,
            "seeded_from": "BENCH_SF100.json (r9 committed run)",
            "queries": rec["queries"],
        }) + "\n")


def _trailing_medians() -> dict[str, float]:
    series: dict[str, list[float]] = {}
    if not HISTORY.exists():
        return {}
    for line in HISTORY.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        for q, v in rec.get("queries", {}).items():
            series.setdefault(q, []).append(v)
    out = {}
    for q, vals in series.items():
        vals = sorted(vals[-TRAILING_K:])
        out[q] = vals[len(vals) // 2]
    return out


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
        ROOT / "BENCH_SF100.json"
    )
    meta_p = Path(SF_DIR) / "_gen_meta.json"
    meta = json.loads(meta_p.read_text()) if meta_p.exists() else {}
    _seed_history_if_absent()
    medians = _trailing_medians()
    spark = get_spark(app_name="bench_sf100")
    qs = registry.queries()
    timings, plans, errors = {}, {}, {}

    def run_query(name: str) -> None:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            n = df.count() if not df.isStreaming else None
            t = round(time.time() - t0, 3)
            timings[name] = min(t, timings.get(name, t))
            # executed plan AFTER the action: AQE's isFinalPlan bits
            plans[name] = plan_bits(df)
            plans[name]["rows"] = n
        except Exception as exc:  # noqa: BLE001 — record, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"{name}: {timings.get(name, 'ERR')}s", file=sys.stderr)

    for name in SUBSET:
        run_query(name)

    # banded grading vs trailing medians (bench.py discipline; at this
    # tier queries run minutes, so over-band reruns are capped at
    # MAX_GRADE_PASSES and whatever stays hot is annotated, never
    # silently committed)
    def _hot() -> list[str]:
        return [
            q for q, t in timings.items()
            if medians.get(q) and t > GRADE_BAND * medians[q]
        ]

    reruns: dict[str, int] = {}
    for pass_no in range(MAX_GRADE_PASSES):
        hot = _hot()
        if not hot:
            break
        print(
            f"bench_sf100: grade pass {pass_no + 1}: {len(hot)} over "
            f"{GRADE_BAND}x trailing median: {','.join(hot)}",
            file=sys.stderr,
        )
        for name in hot:
            reruns[name] = reruns.get(name, 0) + 1
            run_query(name)
    over_band = {
        q: round(timings[q] / medians[q], 2) for q in _hot()
    }
    factors = {
        q: round(timings[q] / medians[q], 2)
        for q in timings if medians.get(q)
    }

    rnd = current_round()
    out = {
        "metric": "sf100_subset_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "round": rnd,
        "queries": timings,
        "sf": "sf100 (100x facts, zipf, gen_version="
              f"{meta.get('gen_version')})",
        "grading": {
            "mode": "per_query_vs_trailing_median",
            "grade_band": GRADE_BAND,
            "trailing_window": TRAILING_K,
            "per_query_factor": factors,
            "n_with_history": len(factors),
            "n_over_band": len(over_band),
            "over_band": over_band,
            "reruns": reruns,
        },
        "timing_notes": {
            "ann_ivf_topk": "includes in-query centroid build each run; "
            "the materialized index/vector.py probe is the production "
            "path (ann_vector_index_topk row)",
        },
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
    try:
        with HISTORY.open("a") as f:
            f.write(json.dumps({
                "ts": time.time(),
                "round": rnd,
                "queries": timings,
                "n_over_band": len(over_band),
            }) + "\n")
    except OSError as exc:  # pragma: no cover — read-only checkout
        print(f"bench_sf100: history append failed: {exc}", file=sys.stderr)
    print(json.dumps({k: v for k, v in out.items() if k != "plans"}))
    sys.exit(1 if (errors or banned) else 0)


if __name__ == "__main__":
    main()
