#!/usr/bin/env python
"""Headline benchmark: run the registry's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (collected) but results are discarded;
the first query's timing excludes JVM/session spin-up because the
session is created before the clock starts.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark import registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: every family the engine implements, weighted toward
# the shapes that dominate at 100 TB (scans, star joins, windows).
# Grouped into named families so the in-run load canary (a scan_count
# probe BETWEEN families) can attribute machine-load noise to the
# family it actually hit — r4's committed run ramped loadavg 4.5→12.9
# mid-run and the start-only probe couldn't see it.
BENCH_FAMILIES = [
    ("scan", [
        "scan_count",
        "scan_by_type",
        "scan_multi_breakdown",
        "scan_filter_and_or",
        "scan_quantize",
        "scan_day_window",
        "scan_json_prop",
        "scan_weighted_reagg",
    ]),
    ("tpch", [
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "q5_revenue_by_nation",
        "top_customers_per_nation",
        "orders_with_discounted_lines",
        "q13_customer_order_distribution",
        "q18_large_volume_orders",
        "q6_forecast_revenue",
        "q7_volume_shipping",
        "q10_returned_top_customers",
        "q2_min_cost_supplier",
        "q11_important_parts",
        "q20_potential_promotion",
        "q21_waiting_suppliers",
    ]),
    ("events", [
        "asof_purchase_last_click",
        "orders_in_promo_windows",
        "events_user_sessions",
        "events_value_percentiles",
        "events_sliding_window_5m",
        "events_pivot_type_by_day",
        "events_p99_outliers",
    ]),
    ("text", [
        "text_tokens_by_source",
        "text_tfidf_top_terms",
        "text_unigram_logprob",
        "text_duplicate_spans",
        "text_repetition_stats",
        "decontam_benchmark_overlap",
        "dedup_cross_source_matrix",
        "source_unigram_kl",
        "docs_training_order",
        "corpus_version_diff",
        "text_bpe_fertility",
        "docs_source_mix_weights",
        "corpus_token_spectrum",
    ]),
    ("ann", [
        "ann_hard_negatives",
        "embedding_label_outliers",
        "split_leakage_report",
        "ann_vector_index_topk",
    ]),
    ("dedup", [
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_embedding_lsh",
        "customers_fuzzy_name_pairs",
        "ann_cosine_topk_blocked",
        "dedup_incremental_probe",
    ]),
]
BENCH_QUERIES = [q for _, qs in BENCH_FAMILIES for q in qs]


HISTORY = Path(__file__).resolve().parent / "BENCH_HISTORY.jsonl"


def _loadavg():
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover — non-POSIX
        return None


def _trailing_medians() -> dict[str, float]:
    """Per-query median of past recorded mins, from BENCH_HISTORY.jsonl.
    This is the baseline that separates machine load (everything slow
    at once) from a plan regression (one query slow, history still)."""
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
        vals = sorted(vals)
        out[q] = vals[len(vals) // 2]
    return out


def main() -> None:
    spark = get_spark(app_name="dragnet_bench")
    # warm the JVM with a trivial action, and the Python UDF workers
    # with a no-op pandas UDF across all cores (first-use worker fork +
    # pandas import would otherwise bill the first UDF query ~6s of
    # local-only cold start; a long-lived cluster has none)
    spark.range(1).count()
    from pyspark.sql.functions import col, pandas_udf  # noqa: E402

    _warm = pandas_udf(lambda s: s, "long")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(1024).repartition(cpus).select(_warm(col("id"))).count()

    load_start = _loadavg()
    medians = _trailing_medians()

    def run_once(e) -> float:
        t0 = time.perf_counter()
        df = e.spark(spark, SF_DIR)
        # noop sink executes the full plan (no column pruning
        # shortcut, nothing shipped to the driver)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    retried: list[str] = []
    canary_entry = registry.REGISTRY["scan_count"]

    def run_query(name: str) -> None:
        e = registry.REGISTRY.get(name)
        if e is None:
            return
        # steady-state: min of 2 runs; a 3rd only when the first two
        # disagree by >25% (load noise). Run 1 pays one-time Catalyst
        # analysis + whole-stage codegen compilation (amortized to zero
        # on a long-lived cluster); later runs are the recurring cost.
        # Data is re-read each time — only compilation is warm.
        # One broken query must not zero the whole bench: failures are
        # recorded per-query and the JSON line is always emitted.
        try:
            runs = [run_once(e), run_once(e)]
            if max(runs) > 1.25 * min(runs):
                runs.append(run_once(e))
            best = min(runs)
            # load gate: a trivial query far above its trailing median
            # means the box is busy, not that the plan regressed —
            # retry instead of recording a number that muddies the
            # round-over-round signal
            med = medians.get(name)
            if med and best > 2 * med:
                if name not in retried:
                    retried.append(name)
                runs.append(run_once(e))
                best = min(runs)
        except Exception as exc:  # noqa: BLE001 — degrade, don't die
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} failed: {errors[name]}", file=sys.stderr)
            return
        timings[name] = round(min(best, timings.get(name, best)), 3)

    # in-run load canary: a scan_count probe BEFORE each family. The
    # per-family load factor (probe / session-median probe) attributes
    # mid-run load spikes to the family they hit; families whose probe
    # exceeds 1.5x the session median are re-run once (min with the
    # loaded numbers — a re-run under load can only improve them).
    canary_samples: dict[str, float] = {}
    for fam, qnames in BENCH_FAMILIES:
        canary_samples[fam] = round(run_once(canary_entry), 3)
        for name in qnames:
            run_query(name)
    probes = sorted(canary_samples.values())
    session_median = probes[len(probes) // 2]
    canary: dict[str, dict] = {"session_median_sec": session_median, "families": {}}
    for fam, qnames in BENCH_FAMILIES:
        factor = round(canary_samples[fam] / session_median, 2) if session_median else 1.0
        reran = factor > 1.5
        if reran:
            print(f"bench: family {fam} ran under load x{factor}; re-running",
                  file=sys.stderr)
            for name in qnames:
                run_query(name)
            post = round(run_once(canary_entry), 3)
            canary["families"][fam] = {
                "canary_sec": canary_samples[fam],
                "load_factor": factor,
                "reran": True,
                "rerun_canary_sec": post,
            }
        else:
            canary["families"][fam] = {
                "canary_sec": canary_samples[fam],
                "load_factor": factor,
                "reran": False,
            }

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(timings.values()), 3)
    load_end = _loadavg()
    probe = timings.get("scan_count")
    probe_med = medians.get("scan_count")
    note = (
        f"loadavg start={load_start} end={load_end} (cpus={cpus}); "
        f"scan_count={probe}s vs trailing_median="
        f"{round(probe_med, 3) if probe_med else None}s"
    )
    if retried:
        note += f"; load-retried: {','.join(retried)}"
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load_note": note,
        "canary": canary,
    }
    if errors:
        # the headline total excludes the failed queries' time, so it
        # is NOT comparable against a clean run or BASELINE.md — say so
        out["errors"] = errors
        out["incomplete"] = True
    try:
        with HISTORY.open("a") as f:
            f.write(json.dumps({
                "ts": time.time(),
                "sf": out["sf"],
                "loadavg": [load_start, load_end],
                "queries": timings,
                "canary": canary_samples,
            }) + "\n")
    except OSError as exc:  # pragma: no cover — read-only checkout
        print(f"bench: history append failed: {exc}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
