#!/usr/bin/env python
"""Quantized + incremental vector-index soak (VERDICT r5 #2/#3).

Part A — quantization I/O: build the float and int8 materialized IVF
indexes over the same corpus/centroids and measure (a) on-disk bytes
of the whole store and of exactly the cells a 64-query batch probes
at n_probe=4 (partition pruning means probed-cell bytes ARE the scan's
I/O), (b) probe wall-clock on both stores, (c) result agreement.

Part B — incremental append: build the quantized index from replica 0,
append replicas 1..K-1 against the PERSISTED centroids, and verify the
probe equals a fresh rebuild over the K× union with the same centroids
— then time the probe at K× and report cell skew (the recenter
trigger's input). Replicas use the soak_curation ±1 sign-mask isometry
so cells stay populated but replicas stay near-orthogonal.

Usage: python tools/soak_vindex.py [K] (default 16)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.index.vector import (  # noqa: E402
    append_vector_index,
    build_vector_index,
    load_vector_index_meta,
    query_vector_index,
    vector_index_cell_stats,
)
from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.sources.tables import load_table  # noqa: E402
from tools.soak_curation import (  # noqa: E402
    embedding_replica,
    replicate_embeddings,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 64
N_PROBE = 4
N_CENTROIDS = 16


def du(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def probed_cells(path: str, qvecs: np.ndarray, n_probe: int) -> list[int]:
    meta = load_vector_index_meta(path)
    C = np.asarray(meta["centroids"], dtype=np.float64)
    M = qvecs / np.maximum(np.linalg.norm(qvecs, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(M @ C.T), axis=1)[:, :n_probe]
    return sorted({int(c) for row in order for c in row})


def cell_bytes(path: str, cells: list[int]) -> int:
    return sum(
        du(os.path.join(path, "vectors", f"cell={c}")) for c in cells
    )


def timed_probe(spark, path, q, **kw) -> tuple[float, int]:
    best, n = None, 0
    for _ in range(2):
        t0 = time.time()
        n = query_vector_index(spark, path, q, **kw).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), n


def main() -> None:
    k_target = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(app_name="soak_vindex")
    spark.range(1).count()
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    n_base = emb.count()
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    qvecs = np.array(
        [r["embedding"] for r in q.collect()], dtype=np.float64
    )
    out: dict = {"sf_dir": SF_DIR, "n_base_vectors": n_base, "k": k_target}

    # ---- Part A: float vs quantized store
    root = tempfile.mkdtemp(prefix="soak_vindex_")
    path_f, path_q = os.path.join(root, "f"), os.path.join(root, "q")
    t0 = time.time()
    meta = build_vector_index(
        spark, emb, path_f, n_centroids=N_CENTROIDS, seed=42
    )
    out["build_float_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    build_vector_index(
        spark, emb, path_q, n_centroids=N_CENTROIDS, seed=42,
        quantize=True, centroids=meta["centroids"],
    )
    out["build_quant_sec"] = round(time.time() - t0, 2)

    cells = probed_cells(path_f, qvecs, N_PROBE)
    bf, bq = cell_bytes(path_f, cells), cell_bytes(path_q, cells)
    out.update(
        store_bytes_float=du(path_f),
        store_bytes_quant=du(path_q),
        probed_cells=len(cells),
        probe_bytes_float=bf,
        probe_bytes_quant=bq,
        probe_bytes_ratio=round(bf / bq, 2),
    )
    tf, nf = timed_probe(spark, path_f, q, k=5, n_probe=N_PROBE)
    tq, nq = timed_probe(spark, path_q, q, k=5, n_probe=N_PROBE)
    f_rows = {
        (r["query_id"], r["neighbor_id"])
        for r in query_vector_index(
            spark, path_f, q, k=5, n_probe=N_PROBE
        ).collect()
    }
    q_rows = {
        (r["query_id"], r["neighbor_id"])
        for r in query_vector_index(
            spark, path_q, q, k=5, n_probe=N_PROBE
        ).collect()
    }
    out.update(
        probe_float_sec=tf,
        probe_quant_sec=tq,
        probe_rows=nf,
        quant_recall_vs_float=round(len(f_rows & q_rows) / len(f_rows), 4),
    )
    assert nf == nq == N_QUERIES * 5, (nf, nq)

    # ---- Part B: append K-1 replicas vs rebuild with same centroids
    inc_path = os.path.join(root, "inc")
    re_path = os.path.join(root, "re")
    build_vector_index(
        spark, emb, inc_path, n_centroids=N_CENTROIDS, seed=42,
        quantize=True, centroids=meta["centroids"],
    )
    t0 = time.time()
    for r in range(1, k_target):
        append_vector_index(spark, embedding_replica(emb, r), inc_path)
    out["append_sec_total"] = round(time.time() - t0, 2)
    build_vector_index(
        spark, replicate_embeddings(emb, k_target), re_path,
        quantize=True, centroids=meta["centroids"],
    )
    inc_rows = {
        tuple(r)
        for r in query_vector_index(
            spark, inc_path, q, k=5, n_probe=N_PROBE
        ).collect()
    }
    re_rows = {
        tuple(r)
        for r in query_vector_index(
            spark, re_path, q, k=5, n_probe=N_PROBE
        ).collect()
    }
    out["append_equals_rebuild"] = inc_rows == re_rows
    tk, nk = timed_probe(spark, inc_path, q, k=5, n_probe=N_PROBE)
    out["probe_quant_sec_at_k"] = tk
    stats = [
        r["n_vectors"]
        for r in vector_index_cell_stats(spark, inc_path).collect()
    ]
    out.update(
        total_indexed=sum(stats),
        cell_skew_max_over_mean=round(
            max(stats) / (sum(stats) / len(stats)), 2
        ),
    )
    assert sum(stats) == n_base * k_target, (sum(stats), n_base, k_target)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
