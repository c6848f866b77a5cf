#!/usr/bin/env python
"""Stage attribution for semdedup_kmeans's 10⁴-tier scale factor
(VERDICT r12 #3): the pinned-k=8 entry measured ×26.8 on 10× the
sf1000 data, and the explanation in BENCH_SF10000.json was argued
(scan-cache contention), not measured. This probe re-runs the SAME
computation as ops.kmeans.kmeans_assign (k=8, 3 Lloyd rounds — the
registry entry's exact parameters) with a wall-clock timer around
every stage, at any tier:

  quantize_persist  — quantize + persist + the count that forces it
                      (the one real corpus scan)
  seeds             — kmeans_seeds over the persisted vectors
  lloyd_i           — per-iteration: assign + (cluster, dim) agg +
                      centroid collect (one pass over the persisted
                      relation each)
  final_assign      — the returned assignment + localCheckpoint

Run it at two tiers and the super-linear term is whichever stage's
ratio exceeds the data ratio — that replaces the argued note with a
decomposition. Prints ONE JSON line.

Usage: python tools/probe_semdedup_stages.py [SF_DIR] [K] [ITERS]
       (defaults: testdata_sf10000, 8, 3)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.ops.kmeans import (  # noqa: E402
    _assign,
    kmeans_seeds,
    quantize_vectors,
)
from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.sources.tables import load_table  # noqa: E402

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / "testdata_sf10000"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    iterations = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark(app_name="probe_semdedup_stages")
    emb = load_table(spark, sf_dir, "embeddings")

    stages: dict[str, float] = {}
    t0 = time.time()
    qv = quantize_vectors(emb, "embedding", "vec_id").persist()
    n = qv.count()
    stages["quantize_persist"] = round(time.time() - t0, 2)

    t0 = time.time()
    cents = kmeans_seeds(qv, k)
    stages["seeds"] = round(time.time() - t0, 2)

    for it in range(iterations):
        t0 = time.time()
        assigned = _assign(qv, cents, keep_q=True)
        upd = (
            assigned
            .select("cluster", F.posexplode("q").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.expr("sum(val) div count(1)").alias("v"))
            .collect()
        )
        by_c: dict[int, dict[int, int]] = {}
        for r in upd:
            by_c.setdefault(r["cluster"], {})[r["dim"]] = r["v"]
        cents = [
            [by_c[c][d] for d in range(len(cents[c]))]
            if c in by_c
            else cents[c]
            for c in range(len(cents))
        ]
        stages[f"lloyd_{it}"] = round(time.time() - t0, 2)

    t0 = time.time()
    final = _assign(qv, cents).localCheckpoint(eager=True)
    n_assigned = final.count()
    stages["final_assign"] = round(time.time() - t0, 2)

    # storage-level evidence for the contention hypothesis: how much
    # of the persisted quantized relation sat in memory vs spilled to
    # disk while the Lloyd passes re-scanned it (read BEFORE
    # unpersist, while the blocks are live)
    mem_used = disk_used = 0
    try:
        rdd_infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        for info in rdd_infos:
            mem_used += info.memSize()
            disk_used += info.diskSize()
    except Exception:  # pragma: no cover — status API hiccup
        pass
    qv.unpersist()

    out = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "n_assigned": n_assigned,
        "k": k,
        "iterations": iterations,
        "stages_s": stages,
        "total_s": round(sum(stages.values()), 2),
        "persisted_mem_bytes": mem_used,
        "persisted_disk_bytes": disk_used,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
