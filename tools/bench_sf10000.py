#!/usr/bin/env python
"""10⁴-octave bench: the curation scale paths over the partial 10000×
tier (50M documents, 20M embeddings — ``tools/gen_octave.py
testdata_sf10000 --scale 10000 --tables documents,embeddings``),
banded by tools/bench_octave.run_tier: per-query trailing-median
bands over BENCH_SF10000_HISTORY.jsonl + cost-shape factors vs the
committed BENCH_SF1000.json (10× the documents/embeddings, so a
linear operator lands near 10) + executed-plan audits.

The subset is the sf1000 subset — the point of the ladder is the SAME
queries at every octave, so each tier's factor column is a direct
linearity measurement of the code path the registry actually grades
(all seven are 4-tier oracle-graded; sf1000 adds CORRECTNESS_SF1000).

Usage: python tools/bench_sf10000.py [OUT_JSON]
Env: SF10000_SKIP — declared (never silent) skips recorded in the
  artifact; a JSON object '{"name": "reason", ...}' (preferred —
  reasons are prose) or legacy 'name=reason;...'.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_octave import parse_skips, run_tier  # noqa: E402
from tools.bench_sf1000 import SUBSET  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / "BENCH_SF10000.json"
    )
    skips = parse_skips(os.environ.get("SF10000_SKIP", ""))
    sys.exit(run_tier(
        sf_dir=os.environ.get(
            "SPARK_GRAFT_SF10000_DIR", str(ROOT / "testdata_sf10000")
        ),
        out_path=out,
        history_path=str(ROOT / "BENCH_SF10000_HISTORY.jsonl"),
        subset=list(SUBSET),
        metric="sf10000_curation_subset_total",
        vs_path=str(ROOT / "BENCH_SF1000.json"),
        vs_label="sf1000",
        skips=skips,
        note=(
            "engine-only timings at the 10^4 octave (50M docs / 20M "
            "embeddings on one box); factor ~10 vs the committed "
            "sf1000 rows = linear cost shape on 10x the data. "
            "Correctness for these code paths is graded at "
            "sf0.01/0.1/10x/100x (CORRECTNESS_*) and sf1000 "
            "(CORRECTNESS_SF1000.json); this tier grades cost shape "
            "and plan safety"
        ),
        app_name="bench_sf10000",
        # 32 local scan threads share one JVM heap; the 8g session
        # default OOMed on this tier's 50M-doc parquet scan
        driver_mem="64g",
    ))


if __name__ == "__main__":
    main()
