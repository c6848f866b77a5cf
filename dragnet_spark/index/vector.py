"""Materialized IVF vector index: build once, probe with partition
pruning — the event-index pattern (index/build.py + index/query.py)
applied to embeddings.

The reference materializes pre-aggregated metric views so queries
never rescan raw data (lib/dn.js build → index-scan); the vector twin
materializes the IVF cell assignment so ANN probes never rescan the
corpus either:

* **build**: deterministic k-means centroids (seeded driver-side
  sample, `ops/similarity.train_centroids`) are persisted in
  ``_vector_index.json``; every vector is written under its nearest
  cell via ``partitionBy("cell")`` — one directory per cell.
* **query**: the bounded query batch (same hard ``max_queries``
  broadcast contract as ``cosine_topk_blocked``) computes its
  ``n_probe`` nearest cells DRIVER-side from the persisted centroid
  matrix, and the scan filters ``cell IN (...)`` — Spark partition
  pruning skips every other cell directory, so the I/O cost is
  ~n_probe/n_centroids of the index at any corpus size. Candidates
  score exactly and rank per query (same output contract as
  ``cosine_topk`` / ``ivf_topk``).

With the same centroids, ``query_vector_index`` is result-identical
to the in-memory ``ivf_topk`` (pytest-enforced), and with
``n_probe == n_centroids`` it is exhaustive — identical to the exact
top-k, which is the registry entry's SQL oracle.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dragnet_spark.ops.similarity import (
    _dot,
    _nearest_cells_udf,
    _safe_norm,
    train_centroids,
)

META_FILE = "_vector_index.json"
VECTORS_DIR = "vectors"


def build_vector_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
) -> dict:
    """Materialize ``df``'s vectors under their nearest-centroid cell.

    Returns the metadata dict (also written to ``_vector_index.json``).
    Rebuild-safe: ``mode("overwrite")`` replaces a prior index at the
    same path atomically per cell directory.
    """
    cent = train_centroids(
        df, vec_col, n_centroids=n_centroids, seed=seed
    )
    assign1 = _nearest_cells_udf(cent, 1)
    (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            assign1(F.col(vec_col))[0].alias("cell"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, VECTORS_DIR))
    )
    meta = {
        "version": "1.0",
        "n_centroids": int(len(cent)),
        "dims": int(len(cent[0])),
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "centroids": [[float(x) for x in c] for c in cent],
    }
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump(meta, f)
    return meta


def load_vector_index_meta(path: str) -> dict:
    with open(os.path.join(path, META_FILE)) as f:
        return json.load(f)


def query_vector_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 65536,
) -> DataFrame:
    """Top-k cosine neighbors from the materialized index.

    The query side is collected (bounded by the ``max_queries``
    contract — raises instead of OOMing the driver) and its probe
    cells computed against the persisted centroids with the exact
    numpy ordering the build used, so index answers match the
    in-memory IVF bit-for-bit. Only the probed cell partitions are
    read (``cell IN (...)`` → parquet partition pruning).
    """
    meta = load_vector_index_meta(path)
    if not str(meta.get("version", "")).startswith("1."):
        raise ValueError(f"unsupported vector index version: {meta.get('version')}")
    C = np.asarray(meta["centroids"], dtype=np.float64)
    n_probe = min(n_probe, len(C))

    qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"query_vector_index: query side exceeds max_queries="
            f"{max_queries}; shard the queries or raise the cap explicitly"
        )
    if not qrows:
        # empty query batch → empty result with the right schema
        id_dt = dict(queries.dtypes)[id_col]
        return spark.createDataFrame(
            [], f"query_id {id_dt}, neighbor_id {id_dt}, score double, rank int"
        )
    # same math/tie-order as _nearest_cells_udf: normalize, sims, argsort
    M = np.array([r[1] for r in qrows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(M @ C.T), axis=1)[:, :n_probe]

    probe_rows = [
        (r[0], list(r[1]), [int(c) for c in cells])
        for r, cells in zip(qrows, order)
    ]
    id_dt = dict(queries.dtypes)[id_col]
    vec_dt = dict(queries.dtypes)[vec_col]
    qdf = spark.createDataFrame(
        probe_rows, f"query_id {id_dt}, qvec {vec_dt}, cells array<int>"
    ).select("query_id", "qvec", F.explode("cells").alias("cell"))

    cells_needed = sorted({int(c) for row in order for c in row})
    vecs = (
        spark.read.parquet(os.path.join(path, VECTORS_DIR))
        .filter(F.col("cell").isin(cells_needed))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("cvec"),
            "cell",
        )
    )
    cand = vecs.join(F.broadcast(qdf), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "score",
        F.round(
            _dot(F.col("qvec"), F.col("cvec"))
            / (_safe_norm(F.col("qvec")) * _safe_norm(F.col("cvec"))),
            6,
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
