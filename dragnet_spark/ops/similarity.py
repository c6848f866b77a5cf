"""Similarity search over embedding columns (array<float>).

Two paths:

* :func:`cosine_topk` — exact brute-force top-k via built-in array
  expressions (zip_with dot product). The cross join shuffles the
  smaller (query) side to every partition of the corpus — i.e. a
  broadcast nested-loop — so corpus scaling is linear and the
  heavy side never moves.
* :func:`cosine_topk_blocked` — the same result computed with a
  Pandas UDF doing a real BLAS matmul per Arrow batch against a
  broadcast query matrix: the 100 TB path (vectorized, ~100× the
  scalar expression throughput), kept result-identical to the exact
  path so either can serve the query.

Scores are rounded to 6 decimals *before* ranking, with the neighbor
id as tie-break, so results are reproducible across engines and
summation orders.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from dragnet_spark.ops import spread


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _safe_norm(c):
    n = _norm(c)
    return F.when(n == 0, F.lit(1.0)).otherwise(n)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query vector: the k nearest corpus vectors by cosine.

    Output: (query_id, neighbor_id, score, rank). Self-matches are
    excluded. ``queries`` is expected to be small (it is broadcast).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "score",
            # zero-norm guard (norm 0 -> 1, score 0): without it a zero
            # vector scores NaN, which desc-sorts FIRST and tops every
            # ranking; the blocked path guards the same way
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (_safe_norm(F.col("qvec")) * _safe_norm(F.col("cvec"))),
                6,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_topk_blocked(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 65536,
) -> DataFrame:
    """Same contract as :func:`cosine_topk`, computed as a blocked
    matrix product in a Pandas UDF (mapInPandas over corpus batches ×
    broadcast query matrix). This is the throughput path at scale.

    The query side is collected to the driver and broadcast, so its
    size is a hard contract: more than ``max_queries`` rows raises
    instead of silently OOMing the driver. (65536 × 768-dim float64
    ≈ 400 MB broadcast — about the ceiling a healthy driver absorbs.)
    """
    qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"cosine_topk_blocked: query side exceeds max_queries="
            f"{max_queries}; shard the queries or raise the cap explicitly"
        )
    id_dt = dict(queries.dtypes)[id_col]
    qids = np.array([r[0] for r in qrows])  # dtype from the data
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1.0
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat, qnorm))

    def score_block(it):
        qids_, qmat_, qnorm_ = bq.value
        for pdf in it:
            cids = pdf[id_col].to_numpy()
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0] = 1.0
            sims = (cmat @ qmat_.T) / cnorm[:, None] / qnorm_[None, :]
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids_[None, :], n_c, 0).ravel(),
                    "neighbor_id": np.repeat(cids[:, None], n_q, 1).ravel(),
                    "score": np.round(sims.ravel(), 6),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score_block,
        schema=f"query_id {id_dt}, neighbor_id {id_dt}, score double",
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def train_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 42,
):
    """K-means centroids from a bounded driver-side sample.

    The sample (not the corpus) fits the driver by construction; at
    100 TB this is the standard IVF recipe — train on a few thousand
    vectors, assign distributively. Deterministic for a fixed seed.
    Returns an (n_centroids, dims) float64 ndarray, L2-normalized.

    ``sample_size`` is the enforced driver-memory contract: the
    collect is capped by ``limit(sample_size)`` regardless of corpus
    size, and a nonsensical cap (<= 0 or large enough to endanger the
    driver) raises up front instead of OOMing mid-job.
    """
    if not (0 < sample_size <= 1_000_000):
        raise ValueError(
            f"train_centroids: sample_size={sample_size} outside the "
            "supported (0, 1e6] driver-sample range"
        )
    n = corpus.count()
    frac = min(1.0, (sample_size * 2.0) / max(n, 1))
    rows = (
        corpus.select(vec_col).sample(fraction=frac, seed=seed).limit(sample_size)
    ).collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)  # cosine on unit vectors
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def _nearest_cells_udf(centroids, n_probe: int):
    """Pandas UDF: vector → array of its n_probe nearest centroid ids."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.array(list(vecs), dtype=np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ C.T
        order = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.astype(int).tolist() for row in order])

    return cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids=None,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index.

    Each corpus vector is assigned to its nearest centroid cell (one
    per-row matmul batch, no shuffle); each query probes its n_probe
    nearest cells; candidates = the probed cells' members, scored
    exactly and ranked. Same output contract as :func:`cosine_topk`.

    Recall rises with n_probe (n_probe == n_centroids is exhaustive
    and reproduces the exact result); the scan cost is ~n_probe /
    n_centroids of the corpus instead of all of it — the 100 TB scale
    path when even one blocked full pass per query batch is too much.
    """
    if centroids is None:
        centroids = train_centroids(
            corpus, vec_col, n_centroids=n_centroids, seed=seed
        )

    assign1 = _nearest_cells_udf(centroids, 1)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        assign1(F.col(vec_col))[0].alias("cell"),
    )
    probe = _nearest_cells_udf(centroids, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe(F.col(vec_col))).alias("cell"),
    )
    cand = c.join(F.broadcast(q), "cell").filter(
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


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the k most similar corpus vectors with a DIFFERENT label — the
    negatives an embedding model learns the most from (the easy,
    far-away ones contribute ~zero gradient).

    Same shape as :func:`cosine_topk` — the (small) query side is
    broadcast and the corpus streams, so no corpus self-join — with
    the label inequality applied before ranking. Output: (query_id,
    neighbor_id, neighbor_label, score, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col(label_col).alias("neighbor_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("neighbor_label") != F.col("qlabel"))
        )
        .withColumn(
            "score",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (_safe_norm(F.col("qvec")) * _safe_norm(F.col("cvec"))),
                6,
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neighbor_label", "score", "rank")
    )


# ------------------------------------------------ int8 quantization


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|v|/127``,
    ``q_i = round(v_i/scale)`` ∈ [-127, 127].

    The 4× storage/IO lever for a 100 TB embedding corpus: float32
    vectors become one byte per dim plus one float scale, and cosine
    ranking degrades only marginally (the quantized ANN recall is
    pytest-pinned). Pure built-in expressions — ``transform`` over the
    array, no Python — so quantization runs as a narrow map at scan
    speed. Zero vectors keep scale 0 and all-zero codes.

    Output: (id, qvec array<int>, scale double, n_dims int).
    """
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x))).cast("double")
    scale = (amax / F.lit(127.0)).alias("scale")
    q = F.when(
        amax > 0,
        F.transform(v, lambda x: F.round(x / (amax / 127.0)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.select(
        F.col(id_col).alias("id"),
        q.alias("qvec"),
        scale,
        F.size(v).alias("n_dims"),
    )


def dequantize_error_audit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector reconstruction-error audit of the int8 quantizer:
    ``max|v - q*scale|`` must be ≤ scale/2 (round-to-nearest's bound)
    and every code within [-127, 127]. Emitted as booleans so the
    bound — not an implementation-defined float — is the contract."""
    qdf = quantize_embeddings(df, id_col, vec_col)
    joined = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).join(qdf, "id")
    err = F.array_max(
        F.zip_with(
            "v", "qvec", lambda x, q: F.abs(x.cast("double") - q * F.col("scale"))
        )
    )
    return joined.select(
        "id",
        "n_dims",
        (err <= F.col("scale") * 0.5 + F.lit(1e-12)).alias("recon_ok"),
        (
            F.array_max(F.transform("qvec", lambda q: F.abs(q))) <= 127
        ).alias("codes_in_range"),
    )
