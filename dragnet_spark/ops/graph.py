"""Graph operators: connected components for cluster-level dedup.

Pairwise near-dup detection (minhash/simhash/embedding LSH) emits
edges; deduplication needs the *transitive* clusters — if A~B and B~C,
all three are one group even when A~C never scored. Connected
components assigns every doc its cluster's minimum id as canonical;
keep-one-per-cluster is then a trivial filter.

Algorithm: iterative minimum-label propagation. Each round every node
takes the min label among itself and its neighbors; converges in
O(graph diameter) rounds. Near-dup graphs are unions of near-cliques
(LSH emits most pairs of a dup group directly), so diameter — and the
round count — is small (2-4). Each round is one join + one groupBy:
two hash shuffles on the node id, no driver-side graph state; the
only driver action is the convergence check's count. For
pathological long-chain graphs at extreme scale, the alternating
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) drops rounds to O(log n); the
per-round plan shape here is the same building block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    ids: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """(id, component) for every id, where component is the minimum id
    reachable through ``edges`` (undirected); singletons map to
    themselves. Raises after ``max_iter`` non-converged rounds rather
    than returning a partial labeling. When ``stats`` is passed, its
    ``"rounds"`` key records the executed round count (the O(diameter)
    bound, observable — tools/soak_clusters.py graphs it against
    planted chain diameters).
    """
    # materialize edges before the symmetrize-union: its two branches
    # would otherwise each recompute the (possibly expensive — e.g.
    # a full LSH pipeline) edge lineage within one job
    edges = edges.persist()
    edges.count()
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d")))
        .distinct()
    )
    sym.persist()
    # localCheckpoint EVERY round, not just at the end: persist caches
    # the data but the LOGICAL plan still nests one union+join+agg per
    # iteration, and analyzing/compiling that exponentially-deepening
    # tree OOMed an 8 GB driver on a 441-edge graph at sf0.1. The
    # checkpoint truncates lineage to the materialized blocks each
    # round (bounded plan depth, bounded heap); superseded checkpoint
    # blocks are reference-GC'd by the ContextCleaner.
    labels = ids.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=True)
    try:
        for rounds in range(1, max_iter + 1):
            if stats is not None:
                stats["rounds"] = rounds
            msgs = sym.join(labels, sym.s == labels.id).select(
                F.col("d").alias("id"), "component"
            )
            new_labels = (
                labels.union(msgs)
                .groupBy("id")
                .agg(F.min("component").alias("component"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        sym.unpersist()
        edges.unpersist()


def dedup_cluster_assignments(
    df: DataFrame, id_col: str, pairs: DataFrame
) -> DataFrame:
    """Canonical-doc assignment: every row of ``df`` labeled with its
    near-dup cluster's minimum id (``canonical_id``) and whether it is
    the keeper. ``pairs`` is any pairwise dedup output (id_a, id_b)."""
    comp = connected_components(
        df.select(id_col), pairs, id_col=id_col
    ).withColumnRenamed("id", id_col)
    return comp.select(
        id_col,
        F.col("component").alias("canonical_id"),
        (F.col(id_col) == F.col("component")).alias("is_canonical"),
    )
