#!/usr/bin/env python
"""Parallel octave-tier generator: the same deterministic replica
transforms as tools/gen_sf1.py, fanned across worker PROCESSES over
disjoint replica slices. At --scale 10000 (the 10⁴ tier: 50M
documents, 20M embeddings) the single-connection DuckDB run is
regex-bound at ~41 min; 8 workers bring it to ~6 min per table.

Each worker writes one part file under ``{table}.parquet/`` (a
DIRECTORY of parquet parts — Spark's reader treats it exactly like
the single-file tiers; DuckDB oracles glob it with
``read_parquet('{table}.parquet/*.parquet')``, which
check_correctness-style harnesses handle via the view layer). Every
transform keys off the ABSOLUTE replica index (gen_sf1.scaled_sql's
``r0`` slicing), so the sliced union's CONTENT is identical to the
single-shot run — only the file layout differs.

Usage: python tools/gen_octave.py OUT_DIR --scale K
         [--tables documents,embeddings] [--workers 8] [--uniform]
         [--nulls]   # parquet-resident NULL overlay (gen_nulls rules)
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.gen_sf1 import (  # noqa: E402
    COPY_THROUGH,
    GEN_VERSION,
    SRC,
    scaled_sql,
)


def _gen_slice(args: tuple) -> tuple[str, int, float]:
    """One worker: replicas [r0, r1) of one table → one part file."""
    table, out_dir, k, zipf, r0, r1, part, nulls = args
    import duckdb

    t0 = time.time()
    con = duckdb.connect()
    # each worker is regex/CPU-bound on its own slice; keep DuckDB's
    # intra-query parallelism from oversubscribing the box
    con.execute("SET threads TO 2")
    sql = scaled_sql(r1, zipf, r0, nulls=nulls)[table]
    dst = os.path.join(out_dir, f"{table}.parquet", f"part-{part:04d}.parquet")
    con.execute(
        f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}')"
    ).fetchone()[0]
    con.close()
    return table, n, time.time() - t0


def main() -> None:
    args = list(sys.argv[1:])
    zipf = "--uniform" not in args
    nulls = "--nulls" in args
    args = [a for a in args if a not in ("--uniform", "--nulls")]

    def _opt(name: str, default: str) -> str:
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    k = int(_opt("--scale", "10000"))
    # replica-range offset: generate replicas [offset, offset+k)
    # instead of [0, k). Every transform keys off the ABSOLUTE replica
    # index, so ten --scale 10000 folds at offsets 0, 10000, ... ARE
    # the 10^5 tier's content, materialized 1/10th at a time — the
    # fold-generate-append-delete dial SCALE.md derives for the tier
    # whose corpus exceeds this box's disk.
    offset = int(_opt("--offset", "0"))
    tables = [
        t.strip() for t in _opt("--tables", "documents,embeddings").split(",")
        if t.strip()
    ]
    workers = int(_opt("--workers", "8"))
    if not args:
        print(__doc__)
        sys.exit(2)
    out = args[0]

    jobs = []
    for t in tables:
        if t in COPY_THROUGH:
            continue
        os.makedirs(os.path.join(out, f"{t}.parquet"), exist_ok=True)
        # contiguous replica slices; slice 0 carries replica 0 (the
        # verbatim sf0.1 copy), same as the single-shot layout
        per = (k + workers - 1) // workers
        for w in range(workers):
            r0, r1 = w * per, min((w + 1) * per, k)
            if r0 >= r1:
                break
            jobs.append(
                (t, out, k, zipf, offset + r0, offset + r1, w, nulls)
            )

    t0 = time.time()
    counts: dict[str, int] = {}
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for table, n, dt in ex.map(_gen_slice, jobs):
            counts[table] = counts.get(table, 0) + n
            print(f"{table}: +{n} rows ({dt:.1f}s)", flush=True)

    import shutil

    for t in COPY_THROUGH:
        if t in tables:
            shutil.copyfile(
                os.path.join(SRC, f"{t}.parquet"),
                os.path.join(out, f"{t}.parquet"),
            )
            counts[t] = -1
            print(f"{t}: copied through")

    mode = "zipf" if zipf else "uniform"
    with open(os.path.join(out, "_gen_meta.json"), "w") as f:
        json.dump(
            {
                "gen_version": GEN_VERSION,
                "scale": k,
                "offset": offset,
                "mode": mode,
                "nulls": nulls,
                "src": SRC,
                "rows": counts,
                "tables_subset": sorted(tables),
                "layout": f"directory-per-table parquet parts ({workers} workers)",
                "generated_at": time.time(),
            },
            f,
            indent=1,
        )
    print(f"done in {time.time() - t0:.1f}s (scale={k}, {mode}, "
          f"{workers} workers)")


if __name__ == "__main__":
    main()
