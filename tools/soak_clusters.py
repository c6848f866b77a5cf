#!/usr/bin/env python
"""Cluster-propagation scaling soak (VERDICT r5 #8): dedup's
transitive-closure step (`ops/graph.connected_components`, iterative
min-label propagation) measured on its WORST topology — chain-shaped
clusters, where the round count hits the O(diameter) bound head-on
(LSH's usual near-cliques converge in 2-4 rounds; chains take ~L).

The soak plants N chains of length L (consecutive-id edges, min label
at one end — maximum propagation distance) and replicates the chain
COUNT K× while keeping L fixed, which is how a growing corpus
actually behaves: more duplicate clusters, not longer ones. Claims
under test:

* rounds ∝ diameter, NOT corpus size — identical round count at every
  K (and ~L/2 rounds when L halves... rounds track L, verified with a
  second diameter);
* wall-clock sublinear in K — each round is one join + one groupBy,
  both partition-parallel;
* exactness — every node labels to its chain's minimum id at every K.

Usage: python tools/soak_clusters.py [K1,K2,...] [CHAIN_LEN] [N_CHAINS]
Defaults: 1,16,64 / 16 / 500. Prints one JSON line (BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.ops.graph import connected_components  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402


def chain_frames(spark, n_chains: int, chain_len: int):
    """ids 0..n_chains*chain_len-1; chain c = consecutive edges over
    [c*L, (c+1)*L). Built distributed (spark.range), no driver lists."""
    n = n_chains * chain_len
    ids = spark.range(n).select(F.col("id"))
    edges = (
        spark.range(n)
        .filter((F.col("id") + 1) % chain_len != 0)  # no edge across chains
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    return ids, edges


def main() -> None:
    ks = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else ["1", "16", "64"])]
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_chains = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    spark = get_spark(app_name="soak_clusters")
    spark.range(1).count()

    out = {"chain_len": chain_len, "base_chains": n_chains, "tiers": {}}
    for k in ks:
        ids, edges = chain_frames(spark, n_chains * k, chain_len)
        stats: dict = {}
        t0 = time.time()
        labels = connected_components(
            ids, edges, max_iter=2 * chain_len + 4, stats=stats
        )
        # exactness: every node's component == its chain's min id
        wrong = labels.filter(
            F.col("component") != (F.col("id") - F.col("id") % chain_len)
        ).count()
        wall = round(time.time() - t0, 2)
        out["tiers"][str(k)] = {
            "nodes": n_chains * k * chain_len,
            "rounds": stats["rounds"],
            "wall_sec": wall,
            "wrong_labels": wrong,
        }
        assert wrong == 0, f"K={k}: {wrong} mislabeled nodes"

    # second diameter at the largest K: rounds must track L, not size
    half_len = max(chain_len // 2, 2)
    ids, edges = chain_frames(spark, n_chains * ks[-1], half_len)
    stats2: dict = {}
    t0 = time.time()
    labels = connected_components(
        ids, edges, max_iter=2 * chain_len + 4, stats=stats2
    )
    wrong = labels.filter(
        F.col("component") != (F.col("id") - F.col("id") % half_len)
    ).count()
    out["half_diameter_probe"] = {
        "chain_len": half_len,
        "k": ks[-1],
        "rounds": stats2["rounds"],
        "wall_sec": round(time.time() - t0, 2),
        "wrong_labels": wrong,
    }
    assert wrong == 0
    rs = [t["rounds"] for t in out["tiers"].values()]
    assert len(set(rs)) == 1, f"rounds varied with K: {rs}"
    assert stats2["rounds"] < rs[0], "rounds did not track diameter"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
