#!/usr/bin/env python
"""Generic banded octave-tier bench: the grading machinery of
tools/bench_sf1000.py factored out so every big tier (sf1000, the
10⁴ tier, whatever comes next) runs ONE implementation — per-query
trailing-median bands over a tier-local history file, cost-shape
factors against the previous octave's committed artifact, executed-
plan audits (BNLJ/cartesian banned), and a self-describing JSON
artifact.

tools/bench_sf1000.py predates this and keeps its own loop (its
committed artifact keys and history are already graded; converting it
would rename fields mid-history for zero behavior change). New tiers
use this engine — tools/bench_sf10000.py is a thin caller. Runnable
directly:

  python tools/bench_octave.py --sf-dir testdata_sf10000 \
      --out BENCH_SF10000.json --history BENCH_SF10000_HISTORY.jsonl \
      --vs BENCH_SF1000.json --metric sf10000_curation_subset_total \
      [--subset q1,q2,...] [--skip '{"name": "reason", ...}']

Skips are DECLARED, never silent: a subset row excluded from a run
(e.g. a stage whose shuffle exceeds this box's disk at the tier — a
real regime measurement, not an inconvenience) is recorded in the
artifact with its written reason.
"""

from __future__ import annotations

import io
import json
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent


def current_round() -> int:
    sys.path.insert(0, str(ROOT))
    import bench

    return bench.current_round()


def parse_skips(spec: str) -> dict[str, str]:
    """Parse a declared-skip spec. Preferred form is a JSON object
    ('{"name": "reason", ...}') — reasons are prose and may contain
    any character; the legacy 'name=reason;...' form survives for
    short reasons but truncates at the first ';' (the r11 artifact
    needed hand repair exactly because a skip reason contained one)."""
    spec = (spec or "").strip()
    if not spec:
        return {}
    if spec.startswith("{"):
        parsed = json.loads(spec)
        return {str(k): str(v) for k, v in parsed.items()}
    skips = {}
    for part in spec.split(";"):
        if "=" in part:
            n, _, why = part.partition("=")
            skips[n.strip()] = why.strip()
    return skips


def _prev_rows(vs_path: Path | None) -> dict[str, float]:
    """Factor denominators from the previous octave's committed
    artifact — never hard-coded (a moved row must move the factor)."""
    if vs_path is None or not vs_path.exists():
        return {}
    try:
        return json.loads(vs_path.read_text()).get("queries", {})
    except json.JSONDecodeError:
        return {}


def _seed_history_if_absent(history: Path, out_default: Path) -> None:
    if history.exists() or not out_default.exists():
        return
    try:
        rec = json.loads(out_default.read_text())
    except json.JSONDecodeError:
        return
    if not rec.get("queries"):
        return
    with history.open("w") as f:
        f.write(json.dumps({
            "ts": None,
            "round": rec.get("round"),
            "seeded_from": f"{out_default.name} (committed run)",
            "queries": rec["queries"],
        }) + "\n")


def _trailing_medians(history: Path, k: int) -> dict[str, float]:
    series: dict[str, list[float]] = {}
    if not history.exists():
        return {}
    for line in history.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        for q, v in rec.get("queries", {}).items():
            series.setdefault(q, []).append(v)
    out = {}
    for q, vals in series.items():
        vals = sorted(vals[-k:])
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


def run_tier(
    *,
    sf_dir: str,
    out_path: str,
    history_path: str,
    subset: list[str],
    metric: str,
    vs_path: str | None = None,
    vs_label: str = "previous octave",
    note: str = "",
    skips: dict[str, str] | None = None,
    grade_band: float = 1.2,
    trailing_k: int = 8,
    max_grade_passes: int = 1,
    app_name: str = "bench_octave",
    driver_mem: str | None = None,
) -> int:
    """Run the tier; write the artifact; return the exit code.

    ``driver_mem`` sizes the local JVM heap for the tier (honored
    only if DRAGNET_DRIVER_MEM isn't already set): in local[N] mode
    all N scan threads share ONE heap, and the session default (8g —
    right for the test/driver tiers) OOMed the vectorized parquet
    readers at the 10⁴ tier's 50M-doc scan, taking the JVM and every
    later query's timing with it."""
    import os as _os

    from dragnet_spark import registry
    from dragnet_spark.session import get_spark

    if driver_mem:
        _os.environ.setdefault("DRAGNET_DRIVER_MEM", driver_mem)

    skips = dict(skips or {})
    history = Path(history_path)
    meta_p = Path(sf_dir) / "_gen_meta.json"
    meta = json.loads(meta_p.read_text()) if meta_p.exists() else {}
    _seed_history_if_absent(history, Path(out_path))
    medians = _trailing_medians(history, trailing_k)
    prev = _prev_rows(Path(vs_path) if vs_path else None)
    spark = get_spark(app_name=app_name)
    qs = registry.queries()
    timings: dict[str, float] = {}
    plans: dict[str, dict] = {}
    errors: dict[str, str] = {}

    def run_query(name: str) -> None:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            n = df.count()
            t = round(time.time() - t0, 3)
            timings[name] = min(t, timings.get(name, t))
            plans[name] = plan_bits(df)
            plans[name]["rows"] = n
        except Exception as exc:  # noqa: BLE001 — record, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"{name}: {timings.get(name, 'ERR')}s", file=sys.stderr)
        # Shuffle files are deleted only when the JVM GCs the shuffle
        # dependency objects (ContextCleaner is GC-driven), and a big
        # octave heap may not GC for the whole run — so each query's
        # shuffle data stays on disk under the NEXT query's spills.
        # Measured at the 10⁴ tier: ~20 GB of dead shuffle from two
        # finished queries helped push the minhash run over this
        # box's free disk. Nudge a full GC between queries; the sleep
        # gives the async cleanup a moment to unlink.
        try:
            spark.sparkContext._jvm.System.gc()
            time.sleep(3)
        except Exception:  # pragma: no cover — py4j hiccup
            pass

    for name in subset:
        if name in skips:
            print(f"{name}: SKIP ({skips[name]})", file=sys.stderr)
            continue
        run_query(name)

    def _hot() -> list[str]:
        return [
            q for q, t in timings.items()
            if medians.get(q) and t > grade_band * medians[q]
        ]

    reruns: dict[str, int] = {}
    for pass_no in range(max_grade_passes):
        hot = _hot()
        if not hot:
            break
        print(
            f"{metric}: grade pass {pass_no + 1}: {len(hot)} over "
            f"{grade_band}x trailing median: {','.join(hot)}",
            file=sys.stderr,
        )
        for name in hot:
            reruns[name] = reruns.get(name, 0) + 1
            run_query(name)
    over_band = {q: round(timings[q] / medians[q], 2) for q in _hot()}
    band_factors = {
        q: round(timings[q] / medians[q], 2)
        for q in timings if medians.get(q)
    }
    vs_prev = {
        q: round(timings[q] / prev[q], 2)
        for q in timings if prev.get(q)
    }

    rnd = current_round()
    out = {
        "metric": metric,
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "round": rnd,
        "queries": timings,
        f"factor_vs_{vs_label}": vs_prev,
        "sf": (
            f"{Path(sf_dir).name} (gen_version={meta.get('gen_version')}, "
            f"scale={meta.get('scale')}, tables={meta.get('tables_subset')}, "
            f"rows={meta.get('rows')})"
        ),
        "grading": {
            "mode": f"per_query_vs_trailing_median + factor_vs_{vs_label}",
            "grade_band": grade_band,
            "trailing_window": trailing_k,
            "per_query_factor": band_factors,
            "n_with_history": len(band_factors),
            "n_over_band": len(over_band),
            "over_band": over_band,
            "reruns": reruns,
            "denominators_from": (
                f"{Path(vs_path).name} (committed)" if vs_path else None
            ),
        },
        "plans": plans,
        "note": note,
    }
    if skips:
        out["declared_skips"] = skips
    if errors:
        out["errors"] = errors
    banned = [
        n for n, p in plans.items() if p.get("bnlj") or p.get("cartesian")
    ]
    out["banned_plan_shapes"] = banned
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    try:
        with history.open("a") as f:
            f.write(json.dumps({
                "ts": time.time(),
                "round": rnd,
                "queries": timings,
                "n_over_band": len(over_band),
            }) + "\n")
    except OSError as exc:  # pragma: no cover — read-only checkout
        print(f"{metric}: history append failed: {exc}", file=sys.stderr)
    print(json.dumps({k: v for k, v in out.items() if k != "plans"}))
    return 1 if (errors or banned) else 0


def main() -> None:
    args = list(sys.argv[1:])

    def _opt(name: str, default: str | None = None) -> str | None:
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    sf_dir = _opt("--sf-dir")
    out = _opt("--out")
    history = _opt("--history")
    metric = _opt("--metric", "octave_subset_total")
    vs = _opt("--vs")
    vs_label = _opt("--vs-label", "prev_octave")
    subset_s = _opt("--subset")
    skip_s = _opt("--skip", "") or ""
    if not (sf_dir and out and history and subset_s):
        print(__doc__)
        sys.exit(2)
    skips = parse_skips(skip_s)
    sys.exit(run_tier(
        sf_dir=sf_dir,
        out_path=out,
        history_path=history,
        subset=[s.strip() for s in subset_s.split(",") if s.strip()],
        metric=metric,
        vs_path=vs,
        vs_label=vs_label,
        skips=skips,
    ))


if __name__ == "__main__":
    main()
