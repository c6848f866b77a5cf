#!/usr/bin/env python
"""Generate the sf1-equivalent join-family tier (VERDICT r5 #4).

Derives a 10× fact tier from the driver's deterministic sf0.1 drop
(seed=42 heritage — this script is itself fully deterministic, no RNG):
``customer``/``orders``/``lineitem``/``events`` are replicated 10 ways
with disjoint key ranges (replica r shifts every key by r·SHIFT, and
foreign keys shift together so referential integrity holds per
replica) plus a per-replica price perturbation so replicas aren't
byte-identical. Dimensions (``region nation supplier part``) and the
curation tables (``documents embeddings``) copy through unscaled —
dims staying small is the point (they must remain broadcastable at
any fact scale), and the join family is what this tier exists to
stress:

    lineitem 600k → 6M rows, orders 150k → 1.5M, customer 15k → 150k,
    events 100k → 1M.

Output: one parquet FILE per table (DuckDB COPY — single file, many
row groups, so Spark still scans it in parallel) under
``testdata_sf1/`` (gitignored; regenerate with this script).

Usage: python tools/gen_sf1.py [OUT_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata_sf1",
)
K = 10
OSHIFT = 10_000_000  # order keys
CSHIFT = 1_000_000   # customer keys
ESHIFT = 10_000_000  # event ids
USHIFT = 100_000     # user ids

COPY_THROUGH = [
    "region", "nation", "supplier", "part", "documents", "embeddings",
]

SCALED = {
    "customer": f"""
        SELECT c_custkey + r.r * {CSHIFT} AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + r.r * {CSHIFT} AS VARCHAR),
                                   9, '0') AS c_name,
               c_nationkey,
               round(c_acctbal + r.r * 0.13, 2) AS c_acctbal,
               c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet'), range({K}) r(r)
    """,
    "orders": f"""
        SELECT o_orderkey + r.r * {OSHIFT} AS o_orderkey,
               o_custkey + r.r * {CSHIFT} AS o_custkey,
               o_orderstatus,
               round(o_totalprice * (1 + r.r * 0.001), 2) AS o_totalprice,
               o_orderdate,
               o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), range({K}) r(r)
    """,
    "lineitem": f"""
        SELECT l_orderkey + r.r * {OSHIFT} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               round(l_extendedprice * (1 + r.r * 0.001), 2)
                 AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), range({K}) r(r)
    """,
    "events": f"""
        SELECT event_id + r.r * {ESHIFT} AS event_id,
               ts,
               user_id + r.r * {USHIFT} AS user_id,
               event_type,
               round(value * (1 + r.r * 0.001), 2) AS value,
               props
        FROM read_parquet('{SRC}/events.parquet'), range({K}) r(r)
    """,
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    t0 = time.time()
    for t, sql in SCALED.items():
        dst = os.path.join(OUT, f"{t}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, "
            f"ROW_GROUP_SIZE 122880)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")
    for t in COPY_THROUGH:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(OUT, f"{t}.parquet"),
        )
        print(f"{t}: copied through")
    print(f"done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
