#!/usr/bin/env python
"""SemDeDup assignment-ladder probe (VERDICT r13 #7): measure the
L=3 ladder against the graded two-level form instead of deriving it.

SCALE.md ("SemDeDup past 10⁴") names the L-level dial — flat
assignment costs n·k, an L-level ladder ≈ L·n·k^{1/L} — and defers
L=3 until a tier crosses ~2×10⁹ vectors on one box. The chunked
argmin is level-independent, so the probe form is mechanical: one
flat Lloyd pass into k^{1/3} SUPER-clusters, then two nested
``applyInPandas`` Lloyd stages (mid, leaf), each the library's
level-2 ``sub`` discipline (md5-ordered seeds, integer matmul,
first-minimum argmin, truncating-div centroid update, chunked
distance blocks). Leaf sizes stay ≈ target_rows_per_cluster, so the
prune stage would consume the output unchanged.

This is a WALL probe, not a graded entry: the two-level form stays
the oracle-graded production path (`semdedup_prune_two_level`); the
probe exists so the decision "switch to L=3 at ~2B vectors" is a
measured curve, not an argument. At sf1000 (2M vectors, k=8000) the
theoretical pass-cost ratio is (2·n·√k)/(3·n·k^{1/3}) ≈ 180/60 = 3×
in favor of L=3 — but L=3 pays one extra full-corpus shuffle (the
quantized vectors ride to the leaf stage), which is why the
crossover needs measuring, not assuming.

Writes PROBE_SEMDEDUP_LADDER.json: per-form walls, output sanity
(row count, leaf-size quantiles), and the derived crossover note.

Usage: python tools/probe_semdedup_ladder.py [SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ROOT = Path(__file__).resolve().parent.parent


def three_level_assign(
    df,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 3,
    target_rows_per_cluster: int = 250,
):
    """Probe-sized L=3 assignment: flat Lloyd into k^(1/3) supers,
    then two nested per-group Lloyd stages. Packing: leaf cluster id
    = (super · STRIDE + mid) · STRIDE + leaf with STRIDE = 2²⁰ —
    int64 holds three 20-bit levels."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from dragnet_spark.ops.kmeans import (
        LEVEL2_CHUNK_ELEMS,
        _assign,
        _chunked_argmin,
        auto_k,
        kmeans_seeds,
        quantize_vectors,
    )

    STRIDE = 1 << 20
    chunk = LEVEL2_CHUNK_ELEMS

    qv = quantize_vectors(df, vec_col, id_col).persist()
    try:
        n = qv.count()
        k = auto_k(n, target_rows_per_cluster)
        k1 = max(1, math.ceil(k ** (1.0 / 3.0)))
        cents = kmeans_seeds(qv, k1)
        for _ in range(iterations):
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
        level1 = _assign(qv, cents, keep_q=True)

        iters = iterations
        target = target_rows_per_cluster

        def _local_lloyd(ids, Q, k_local):
            """The library level-2 ``sub`` discipline, k_local-sized."""
            import hashlib

            hs = np.array(
                [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
            )
            order = np.lexsort((ids, hs))
            C = Q[order[:k_local]].copy()
            for _ in range(iters):
                a, _d = _chunked_argmin(Q, C, chunk)
                for c in range(k_local):
                    mask = a == c
                    if mask.any():
                        s = Q[mask].sum(axis=0)
                        C[c] = np.sign(s) * (np.abs(s) // mask.sum())
            return _chunked_argmin(Q, C, chunk)

        def mid_stage(key, pdf):
            sup = int(key[0])
            ids = pdf["id"].to_numpy(dtype=np.int64)
            Q = np.asarray(list(pdf["q"]), dtype=np.int64)
            m = len(ids)
            # the remaining two levels must yield ~m/target leaves:
            # sqrt splits the work evenly between them
            k2 = max(1, math.ceil(math.sqrt(m / target)))
            a, _d = _local_lloyd(ids, Q, k2)
            return pd.DataFrame(
                {
                    "id": ids,
                    "cluster": sup * STRIDE + a.astype(np.int64),
                    "q": list(Q),
                }
            )

        def leaf_stage(key, pdf):
            parent = int(key[0])
            ids = pdf["id"].to_numpy(dtype=np.int64)
            Q = np.asarray(list(pdf["q"]), dtype=np.int64)
            m = len(ids)
            k3 = max(1, (m + target - 1) // target)
            a, dmin = _local_lloyd(ids, Q, k3)
            return pd.DataFrame(
                {
                    "id": ids,
                    "cluster": parent * STRIDE + a.astype(np.int64),
                    "dist": dmin,
                }
            )

        mids = (
            level1.select("id", "cluster", "q")
            .groupBy("cluster")
            .applyInPandas(
                mid_stage, schema="id long, cluster long, q array<long>"
            )
        )
        return (
            mids.groupBy("cluster")
            .applyInPandas(
                leaf_stage, schema="id long, cluster long, dist long"
            )
            .localCheckpoint(eager=True)
        )
    finally:
        qv.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / "testdata_sf1000"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else str(
        ROOT / "PROBE_SEMDEDUP_LADDER.json"
    )
    from pyspark.sql import functions as F

    from dragnet_spark.ops.kmeans import kmeans_assign_two_level
    from dragnet_spark.session import get_spark

    spark = get_spark(app_name="probe_semdedup_ladder")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    rec: dict = {"sf_dir": sf_dir, "n_vectors": n, "forms": {}}

    for name, fn in (
        ("two_level", lambda: kmeans_assign_two_level(emb)),
        ("three_level", lambda: three_level_assign(emb)),
    ):
        t0 = time.time()
        res = fn()
        n_out = res.count()
        wall = round(time.time() - t0, 1)
        sizes = (
            res.groupBy("cluster").count()
            .agg(
                F.expr("percentile(count, 0.5)").alias("p50"),
                F.max("count").alias("max"),
                F.count(F.lit(1)).alias("n_clusters"),
            )
            .first()
        )
        rec["forms"][name] = {
            "wall_s": wall,
            "n_assigned": n_out,
            "rows_preserved": n_out == n,
            "n_clusters": sizes["n_clusters"],
            "leaf_p50": float(sizes["p50"]),
            "leaf_max": int(sizes["max"]),
        }
        print(f"{name}: {wall}s, {sizes['n_clusters']} clusters, "
              f"p50 leaf {sizes['p50']}")

    two, three = rec["forms"]["two_level"], rec["forms"]["three_level"]
    rec["note"] = (
        "walls at this tier include fixed Spark overheads that favor "
        "fewer stages; the L=3 form wins when n·(2·sqrt(k) - "
        "3·k^(1/3))·dims·8 bytes of avoided flat-assignment work "
        "exceeds one extra full-corpus shuffle of the quantized "
        "vectors — SCALE.md places that past ~2e9 vectors on this "
        "box; this probe makes the constant factors measured."
    )
    rec["wall_ratio_three_over_two"] = (
        round(three["wall_s"] / two["wall_s"], 2)
        if two["wall_s"] else None
    )
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
