#!/usr/bin/env python
"""Re-grade ONE CORRECTNESS_SF1000 entry and merge the result into
the committed artifact — for entries whose first pass failed on a
box-level resource limit (the two-level prune oracle materializes the
level-1 distance join, ~n·√k 64-dim array rows, and spilled past the
shared run's free disk). Runs with the box to itself and an explicit
DuckDB memory_limit so the oracle prefers RAM over temp spill.

Usage: python tools/regrade_sf1000_entry.py ENTRY [SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402
from tools.check_correctness import register_views  # noqa: E402
from tools.check_sf1000 import check_one  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    entry = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else str(
        ROOT / "testdata_sf1000"
    )
    out_path = Path(sys.argv[3] if len(sys.argv) > 3 else str(
        ROOT / "CORRECTNESS_SF1000.json"
    ))

    spark = get_spark(app_name="regrade_sf1000")
    con = duckdb.connect()
    con.execute("SET memory_limit='110GB'")
    con.execute(f"SET temp_directory='{ROOT / '.duckdb_tmp'}'")
    register_views(con, sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rec = check_one(spark, con, sf_dir, entry, qs[entry], oracles[entry])
    # provenance: a merged re-run was graded under DIFFERENT conditions
    # than the artifact's first pass (dedicated box, explicit DuckDB
    # memory_limit) — stamp it so the artifact distinguishes first-pass
    # greens from regraded ones
    rec["regraded_at"] = time.time()
    rec["regrade_conditions"] = {
        "duckdb_memory_limit": "110GB",
        "tool": "tools/regrade_sf1000_entry.py",
    }
    ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
    print(f"{'OK' if ok else 'FAIL'}  {entry}: {rec}")

    report = json.loads(out_path.read_text())
    report[entry] = rec
    graded = [n for n in report if not n.startswith("_")
              and not report[n].get("skipped")]
    green = [n for n in graded
             if report[n]["rows_match"] and report[n]["schema_match"]
             and report[n]["hash_match"]]
    report["_meta"]["green"] = len(green)
    report["_meta"]["generated_at"] = time.time()
    out_path.write_text(json.dumps(report, indent=1))
    print(f"merged into {out_path}: {len(green)}/{len(graded)} green")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
