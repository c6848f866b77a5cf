#!/usr/bin/env python
"""Generate the sf1-equivalent join-family tier (VERDICT r5 #4), with
ORGANIC Zipf-style customer skew by default (VERDICT r6 #3).

Derives a K× fact tier from the driver's deterministic sf0.1 drop
(seed=42 heritage — this script is itself fully deterministic, no
RNG): ``customer``/``orders``/``lineitem``/``events`` are replicated
K ways with disjoint key ranges (replica r shifts every key by
r·SHIFT, and foreign keys shift together so referential integrity
holds per replica) plus a per-replica price perturbation so replicas
aren't byte-identical. Dimensions (``region nation supplier part``)
copy through unscaled — dims staying small is the point (they must
remain broadcastable at any fact scale). The curation tables scale
too (VERDICT r7 #1): ``documents`` with a structure-preserving
per-replica token salt, ``embeddings`` under a per-replica signed
permutation — each replica repeats the sf0.1 dedup/similarity
structure exactly while cross-replica overlap stays out of every
operator's thresholds (see the per-table comments in ``scaled_sql``).

**Customer skew (default)**: ~30% of each replica's orders are
remapped onto 5 hot customers (a deterministic Knuth-multiplicative
coin on the order key, hot keys ``1,4,7,10,13`` per replica — all
real custkeys, so referential integrity holds). Each hot customer
carries ~6% of the replica's orders instead of ~10 — the Zipf head a
production 100× dataset actually has, so q10/q13/q18's own shuffles
exercise AQE skew handling instead of only a constructed test join.
``--uniform`` restores the flat replication.

Output: one parquet FILE per table (DuckDB COPY — single file, many
row groups, so Spark still scans it in parallel) under
``testdata_sf1/`` (gitignored; regenerate with this script).

    default K=10: lineitem 600k → 6M rows, orders 150k → 1.5M,
    customer 15k → 150k, events 100k → 1M.

Usage: python tools/gen_sf1.py [OUT_DIR] [--scale K] [--uniform]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb

SRC = "/root/testdata/sf0.1"

OSHIFT = 100_000_000  # order keys (room for --scale 100)
CSHIFT = 1_000_000    # customer keys
ESHIFT = 10_000_000   # event ids
USHIFT = 100_000      # user ids
DSHIFT = 100_000      # doc ids
VSHIFT = 100_000      # embedding vec ids

COPY_THROUGH = ["region", "nation", "supplier", "part"]

#: deterministic per-order coin: Knuth multiplicative hash mod 100.
#: < 30 → the order lands on one of 5 hot customers of its replica.
_ZIPF_COIN = "(o_orderkey * 2654435761) % 100 < 30"
_HOT_KEY = "1 + (o_orderkey % 5) * 3"


def scaled_sql(k: int, zipf: bool) -> dict[str, str]:
    if zipf:
        custkey = (
            f"CASE WHEN {_ZIPF_COIN} THEN {_HOT_KEY} + r.r * {CSHIFT} "
            f"ELSE o_custkey + r.r * {CSHIFT} END"
        )
    else:
        custkey = f"o_custkey + r.r * {CSHIFT}"
    return {
        "customer": f"""
            SELECT c_custkey + r.r * {CSHIFT} AS c_custkey,
                   'Customer#' || lpad(CAST(c_custkey + r.r * {CSHIFT} AS VARCHAR),
                                       9, '0') AS c_name,
                   c_nationkey,
                   round(c_acctbal + r.r * 0.13, 2) AS c_acctbal,
                   c_mktsegment
            FROM read_parquet('{SRC}/customer.parquet'), range({k}) r(r)
        """,
        "orders": f"""
            SELECT o_orderkey + r.r * {OSHIFT} AS o_orderkey,
                   {custkey} AS o_custkey,
                   o_orderstatus,
                   round(o_totalprice * (1 + r.r * 0.001), 2) AS o_totalprice,
                   o_orderdate,
                   o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet'), range({k}) r(r)
        """,
        "lineitem": f"""
            SELECT l_orderkey + r.r * {OSHIFT} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   round(l_extendedprice * (1 + r.r * 0.001), 2)
                     AS l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet'), range({k}) r(r)
        """,
        "events": f"""
            SELECT event_id + r.r * {ESHIFT} AS event_id,
                   ts,
                   user_id + r.r * {USHIFT} AS user_id,
                   event_type,
                   round(value * (1 + r.r * 0.001), 2) AS value,
                   props
            FROM read_parquet('{SRC}/events.parquet'), range({k}) r(r)
        """,
        # Documents replicate with a STRUCTURE-PRESERVING per-replica
        # token salt: every whitespace token gets '~r<N>' appended, so
        # within a replica the token/shingle sets are a bijective image
        # of the sf0.1 corpus (every dedup/near-dup relation preserved,
        # same pair counts per replica) while cross-replica shingle
        # overlap is ZERO — total near-dup output grows linearly in K,
        # the way an organically grown corpus does, instead of the K²
        # blow-up naive replication gives (every doc would gain K-1
        # exact twins). Replica 0 keeps the original text verbatim.
        # n_chars is recomputed so the table stays self-consistent.
        "documents": f"""
            SELECT doc_id + r.r * {DSHIFT} AS doc_id,
                   CASE WHEN r.r = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)',
                                            '\\1~r' || r.r, 'g')
                   END AS text,
                   lang,
                   source,
                   length(CASE WHEN r.r = 0 THEN text
                               ELSE regexp_replace(text, '(\\S+)',
                                                   '\\1~r' || r.r, 'g')
                          END) AS n_chars
            FROM read_parquet('{SRC}/documents.parquet'), range({k}) r(r)
        """,
        # Embeddings replicate under a per-replica SIGNED PERMUTATION
        # (affine dim permutation π(i) = (a·i+b) mod d with a odd —
        # bijective for d a power of two — times a hash-signed ±1 per
        # dim): an exactly orthogonal transform whose entries are
        # exactly representable in float, so within a replica every
        # inner product, norm, and cosine is BIT-preserved and the
        # sf0.1 near-dup structure repeats per replica. Across
        # replicas, same-base cosines decorrelate to |cos| ≲ 0.45
        # (permutation defeats the corpus's concentrated-energy dims,
        # which sign flips alone cannot). Different-base cross-replica
        # pairs behave like fresh random pairs — exactly what organic
        # corpus growth produces. Replica 0 is the original, so fixed
        # ANN query ids (vec_id < 10) keep their sf0.1 vectors.
        "embeddings": f"""
            SELECT vec_id + r.r * {VSHIFT} AS vec_id,
                   CASE WHEN r.r = 0 THEN embedding
                        ELSE CAST(list_transform(
                                 range(len(embedding)),
                                 i -> (CASE WHEN hash(i * 1000003 + r.r)
                                                % 2 = 0
                                            THEN 1 ELSE -1 END)
                                      * embedding[
                                          (((2 * ((r.r * 7) % 31) + 3)
                                            * i + r.r * 13)
                                           % len(embedding)) + 1])
                             AS FLOAT[])
                   END AS embedding,
                   label
            FROM read_parquet('{SRC}/embeddings.parquet'), range({k}) r(r)
        """,
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    zipf = "--uniform" not in args
    args = [a for a in args if a != "--uniform"]
    k = 10
    if "--scale" in args:
        i = args.index("--scale")
        k = int(args[i + 1])
        del args[i:i + 2]
    out = args[0] if args else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1",
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    t0 = time.time()
    for t, sql in scaled_sql(k, zipf).items():
        dst = os.path.join(out, f"{t}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, "
            f"ROW_GROUP_SIZE 122880)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")
    for t in COPY_THROUGH:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
        print(f"{t}: copied through")
    mode = "zipf" if zipf else "uniform"
    print(f"done in {time.time() - t0:.1f}s (scale={k}, {mode})")


if __name__ == "__main__":
    main()
