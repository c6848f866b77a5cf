#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB at
sf=0.01, compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values stringified).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# optional second arg: write a driver-format JSON report here
# (rows_match/schema_match/hash_match/spark_rows/oracle_rows/err per query)
OUT_JSON = sys.argv[2] if len(sys.argv) > 2 else None


def norm_cell(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))
        return repr(round(v, 9))
    if isinstance(v, int):
        return repr(v)
    if v is None:
        return "<null>"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def check_one(spark, con, name, fn, oracles):
    """Run one registry query against its oracle. Returns a
    driver-format record (rows_match/schema_match/hash_match/
    spark_rows/oracle_rows/err; no_oracle=True for rows-only)."""
    rec = {
        "rows_match": False,
        "schema_match": False,
        "hash_match": False,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        rec["spark_rows"] = len(srows)
    except Exception as e:
        rec["err"] = f"spark error: {e}"
        return rec, None
    if name not in oracles:
        rec["no_oracle"] = True
        return rec, None
    try:
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        rec["oracle_rows"] = len(drows)
    except Exception as e:
        rec["err"] = f"duckdb error: {e}"
        return rec, None
    rec["schema_match"] = sorted(scols) == sorted(dcols)
    rec["rows_match"] = len(srows) == len(drows)
    detail = []
    if rec["rows_match"] and rec["schema_match"]:
        h1 = value_hash(scols, srows)
        h2 = value_hash(dcols, drows)
        rec["hash_match"] = h1 == h2
        if not rec["hash_match"]:
            # show a sample difference for debugging
            s = {tuple(norm_cell(v) for v in r) for r in srows}
            d = {tuple(norm_cell(v) for v in r) for r in drows}
            detail.append(f"valuehash {h1} != {h2}")
            if s - d:
                detail.append(f"spark-only: {list(s - d)[:3]}")
            if d - s:
                detail.append(f"duck-only: {list(d - s)[:3]}")
    else:
        if not rec["schema_match"]:
            detail.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not rec["rows_match"]:
            detail.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    return rec, "; ".join(detail) if detail else None


def register_views(con, sf_dir: str) -> None:
    """DuckDB views over a tier directory. Tables are either one
    parquet FILE (gen_sf1 single-shot) or a DIRECTORY of part files
    (gen_octave's parallel writer) — glob the latter so both layouts
    grade identically. Partial tiers (e.g. testdata_sf1000:
    documents+embeddings only) simply don't get the missing views; a
    query touching an absent table fails loudly at its own row."""
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )


def main():
    spark = get_spark(app_name="check_correctness")
    con = duckdb.connect()
    register_views(con, SF_DIR)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = os.environ.get("CHECK_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        unknown = keep - set(qs)
        if unknown:
            print(f"CHECK_ONLY names not in registry: {sorted(unknown)}")
            sys.exit(2)
        qs = {n: f for n, f in qs.items() if n in keep}
    report = {}
    failures = 0
    # CHECK_SKIP: "name=reason;name=reason" — entries whose cost is
    # genuinely super-linear in a scaled table (e.g. the sanctioned
    # all-pairs oracle baselines at the 100x octave). NO silent caps:
    # every skip is recorded in the artifact with its reason.
    skip_spec = os.environ.get("CHECK_SKIP", "")
    skips = {}
    for part in skip_spec.split(";"):
        if "=" in part:
            n, _, why = part.partition("=")
            skips[n.strip()] = why.strip()
    unknown = set(skips) - set(qs)
    if unknown:
        print(f"CHECK_SKIP names not in registry: {sorted(unknown)}")
        sys.exit(2)
    for name, why in skips.items():
        report[name] = {"skipped": True, "reason": why}
        print(f"SKIP  {name}: {why}")
    qs = {n: f for n, f in qs.items() if n not in skips}
    for name, fn in qs.items():
        t0 = time.time()
        rec, detail = check_one(spark, con, name, fn, oracles)
        report[name] = rec
        dt = time.time() - t0
        if rec["err"]:
            print(f"FAIL  {name}: {rec['err']}")
            failures += 1
        elif rec.get("no_oracle"):
            print(f"rows  {name}: {rec['spark_rows']} rows (no oracle)")
        elif rec["rows_match"] and rec["schema_match"] and rec["hash_match"]:
            print(f"OK    {name}: {rec['spark_rows']} rows, {dt:.1f}s")
        else:
            print(f"FAIL  {name}: {detail}")
            failures += 1
    if OUT_JSON:
        with open(OUT_JSON, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {OUT_JSON}")
    print(f"\n{len(qs)} queries, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
