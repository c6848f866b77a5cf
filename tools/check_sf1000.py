#!/usr/bin/env python
"""CORRECTNESS at the 1000× curation octave (VERDICT r10 #3): grade
the oracle-tractable subset of the sf1000 bench rows (DuckDB twin vs
Spark, the driver's rows+schema+value-hash discipline) and write ONE
self-contained artifact — every sf1000 bench row either graded or
skip-declared with a written reason — CORRECTNESS_SF1000.json.

The subset is exactly tools/bench_sf1000.SUBSET (the tier's declared
scale paths over the partial documents+embeddings tier). Per-entry
wall time for BOTH engines is recorded: at this tier the oracle is
the expensive side (DuckDB re-derives minhash signatures / unrolled
integer Lloyd chains over 5M docs / 2M vectors), and recording it is
what justifies any future skip declaration with data instead of
assertion.

Usage: python tools/check_sf1000.py [SF_DIR] [OUT_JSON]
  (defaults: testdata_sf1000, CORRECTNESS_SF1000.json)
Env: SF1000_SKIP="name=reason;..." declares per-entry skips, recorded
  verbatim in the artifact (no silent caps — same rule as
  check_correctness.py's CHECK_SKIP).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402
from tools.bench_sf1000 import SUBSET  # noqa: E402
from tools.check_correctness import register_views, value_hash  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent


def _collect(sdf) -> tuple[list[str], list[tuple]]:
    """(columns, rows) via Arrow batches — at this tier several
    entries return millions of rows, and the row-serialized
    ``collect()`` path is minutes-per-entry where ``toArrow`` is
    seconds. ``to_pylist`` yields the same Python-native values
    (int/float/str/None) the Row path gives, so value_hash's
    normalization sees identical cells either way."""
    try:
        tbl = sdf.toArrow()
        cols = list(tbl.column_names)
        return cols, list(zip(*(c.to_pylist() for c in tbl.columns))) if cols else []
    except Exception:  # pragma: no cover — non-Arrow-convertible type
        return list(sdf.columns), [tuple(r) for r in sdf.collect()]


#: oracle results memoized by SQL text: the three minhash entries
#: (batch, from-store, CLI-routed bounded) share ONE oracle string by
#: construction, and at this tier that oracle is a ~20-minute DuckDB
#: signature re-derivation — pay it once per distinct SQL, record
#: oracle_s=0.0 + oracle_cached=True on the reuses
_ORACLE_MEMO: dict[str, tuple[list[str], list[tuple]]] = {}


def check_one(spark, con, sf_dir, name, fn, oracle):
    rec = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "spark_rows": None,
        "oracle_rows": None,
        "spark_s": None,
        "oracle_s": None,
        "err": None,
    }
    t0 = time.time()
    try:
        scols, srows = _collect(fn(spark, sf_dir))
        rec["spark_rows"] = len(srows)
        rec["spark_s"] = round(time.time() - t0, 1)
    except Exception as e:  # noqa: BLE001 — recorded per entry
        rec["err"] = f"spark error: {e}"[:500]
        return rec
    t0 = time.time()
    try:
        if oracle in _ORACLE_MEMO:
            dcols, drows = _ORACLE_MEMO[oracle]
            rec["oracle_cached"] = True
        else:
            cur = con.execute(oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            _ORACLE_MEMO[oracle] = (dcols, drows)
        rec["oracle_rows"] = len(drows)
        rec["oracle_s"] = round(time.time() - t0, 1)
    except Exception as e:  # noqa: BLE001 — recorded per entry
        rec["err"] = f"duckdb error: {e}"[:500]
        return rec
    rec["schema_match"] = sorted(scols) == sorted(dcols)
    rec["rows_match"] = len(srows) == len(drows)
    if rec["rows_match"] and rec["schema_match"]:
        rec["hash_match"] = value_hash(scols, srows) == value_hash(
            dcols, drows
        )
    return rec


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / "testdata_sf1000"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else str(
        ROOT / "CORRECTNESS_SF1000.json"
    )
    meta_p = Path(sf_dir) / "_gen_meta.json"
    gen = json.loads(meta_p.read_text()) if meta_p.exists() else {}

    skips: dict[str, str] = {}
    for part in os.environ.get("SF1000_SKIP", "").split(";"):
        if "=" in part:
            n, _, why = part.partition("=")
            skips[n.strip()] = why.strip()
    unknown = set(skips) - set(SUBSET)
    if unknown:
        print(f"SF1000_SKIP names not in SUBSET: {sorted(unknown)}")
        sys.exit(2)

    spark = get_spark(app_name="check_sf1000")
    con = duckdb.connect()
    # cap the oracle's RAM and give it a spill home: DuckDB's default
    # limit (80% of RAM) plus the Spark JVM heap over-commits the box
    # — the two-level-prune oracle materializes tens of GB and the OS
    # OOM-killer takes the whole sweep down (measured r13: python at
    # 67.8 GB anon-rss killed mid-oracle with a 64g JVM resident).
    # The cap must stay ABOVE that oracle's ~90 GB working set: at
    # 80GB it spills past the box's ~66 GB of free disk instead
    # (measured r13: ENOSPC in duckdb_temp_storage) — 95GB fits
    # beside the default 8g JVM in 125 GB RAM and keeps it in memory
    con.execute(
        "SET memory_limit='%s'"
        % os.environ.get("SF1000_DUCKDB_MEM", "95GB")
    )
    # NO temp_directory on purpose: with one configured, DuckDB plans
    # out-of-core operators proactively and the two-level-prune
    # oracle's ~60 GB of sort/join spill overruns this box's ~65 GB
    # of free disk (measured r13, twice) — while the same query fits
    # the in-RAM limit when spill is impossible (r12's green run and
    # r13's final one). In-memory DBs without a temp dir cannot
    # spill; a genuine over-limit errors loudly instead of taking
    # the disk down with it.
    register_views(con, sf_dir)

    # SF1000_ONLY=a,b: grade only the named entries and MERGE their
    # fresh records into the existing artifact (re-running a failed
    # entry must not re-pay the green entries' 1500-second oracles)
    only = [
        n for n in os.environ.get("SF1000_ONLY", "").split(",") if n.strip()
    ]
    unknown = set(only) - set(SUBSET)
    if unknown:
        print(f"SF1000_ONLY names not in SUBSET: {sorted(unknown)}")
        sys.exit(2)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report: dict[str, dict] = {}
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        report = {k: v for k, v in prior.items() if k != "_meta"}
    failures = 0
    for name, why in skips.items():
        report[name] = {"skipped": True, "reason": why}
        print(f"SKIP  {name}: {why}", flush=True)
    todo = only if only else SUBSET
    for name in todo:
        if name in skips:
            continue
        rec = check_one(spark, con, sf_dir, name, qs[name], oracles[name])
        report[name] = rec
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if rec["err"]:
            print(f"FAIL  {name}: {rec['err']}", flush=True)
            failures += 1
        elif ok:
            print(
                f"OK    {name}: {rec['spark_rows']} rows "
                f"(spark {rec['spark_s']}s, oracle {rec['oracle_s']}s)",
                flush=True,
            )
        else:
            print(
                f"FAIL  {name}: rows {rec['spark_rows']}/{rec['oracle_rows']}"
                f" schema={rec['schema_match']} hash={rec['hash_match']}",
                flush=True,
            )
            failures += 1

    graded = [n for n in report if not report[n].get("skipped")]
    green = [
        n for n in graded
        if report[n]["rows_match"] and report[n]["schema_match"]
        and report[n]["hash_match"]
    ]
    out = {
        "_meta": {
            "tier": (
                f"1000x curation octave ({Path(sf_dir).name}, "
                f"gen_version={gen.get('gen_version')}, "
                f"tables={gen.get('tables_subset')}, "
                f"rows={gen.get('rows')})"
            ),
            "entries": len(report),
            "green": len(green),
            "skipped": len(skips),
            "note": (
                "every BENCH_SF1000 subset row graded against its DuckDB "
                "oracle twin at the full 5M-doc/2M-embedding tier (or "
                "skip-declared with reason); per-entry wall time for both "
                "engines recorded — the oracle side dominates here, which "
                "is why grading tops out at this tier"
            ),
            "generated_at": time.time(),
        },
        **dict(sorted(report.items())),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {out_path}: {len(green)}/{len(graded)} green, "
          f"{len(skips)} skipped, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
