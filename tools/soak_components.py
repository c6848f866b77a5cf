#!/usr/bin/env python
"""Components-store soak: evidence that the incremental fold's cost is
a function of the BATCH, not the corpus (index/components.py's scale
claim), and that K folds stay bit-identical to one batch closure.

Builds a store over a planted base graph of N nodes (pair chains of
bounded length, so the base has real merge structure), then folds K
fixed-size batches of new pairs — each batch touches fresh ids plus a
few existing clusters — recording per-fold wall clock and the
redirect-table size. A flat per-fold wall across K folds while the
corpus grows K-fold is the claim made measurable; the end state is
compared row-for-row to connected_components over everything, before
AND after compaction.

Usage: python tools/soak_components.py [N_BASE] [K] [BATCH]
       (defaults 200000, 8, 5000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.index.components import (  # noqa: E402
    build_components_store,
    compact_components_store,
    components_store_read,
    merge_components_batch,
)
from dragnet_spark.ops.graph import connected_components  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
    spark = get_spark(app_name="soak_components")
    path = tempfile.mkdtemp(prefix="dragnet_compsoak_")

    def base_pairs():
        # chains of 4: (i, i+1) unless i % 4 == 3 — every cluster is a
        # path, so the base closure does real multi-hop work
        return (
            spark.range(n_base - 1)
            .filter(F.col("id") % 4 != 3)
            .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        )

    def batch_pairs(i):
        # each batch: `batch` brand-new chained ids, plus 50 bridge
        # edges into existing clusters (the merge structure)
        lo = n_base + i * batch
        new = (
            spark.range(lo, lo + batch - 1)
            .filter(F.col("id") % 4 != 3)
            .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        )
        bridges = spark.range(50).select(
            (F.col("id") * 137 % n_base).alias("id_a"),
            (lo + F.col("id") * (batch // 50)).alias("id_b"),
        )
        return new.unionByName(bridges)

    ids0 = spark.range(n_base).select(F.col("id"))
    t0 = time.time()
    build_components_store(spark, ids0, base_pairs(), path)
    build_s = round(time.time() - t0, 2)

    fold_s = []
    for i in range(k):
        t0 = time.time()
        merge_components_batch(spark, batch_pairs(i), path)
        fold_s.append(round(time.time() - t0, 2))
    n_redirects = spark.read.parquet(f"{path}/redirects").count()

    all_ids = spark.range(n_base + k * batch).select(F.col("id"))
    all_pairs = base_pairs()
    for i in range(k):
        all_pairs = all_pairs.unionByName(batch_pairs(i))
    truth = connected_components(all_ids, all_pairs)
    got = components_store_read(spark, path)
    diff_pre = got.exceptAll(truth).unionAll(truth.exceptAll(got)).count()

    t0 = time.time()
    compact_components_store(spark, path)
    compact_s = round(time.time() - t0, 2)
    got2 = components_store_read(spark, path)
    diff_post = got2.exceptAll(truth).unionAll(truth.exceptAll(got2)).count()

    out = {
        "n_base": n_base,
        "k_folds": k,
        "batch": batch,
        "build_s": build_s,
        "fold_s": fold_s,
        "fold_flat": max(fold_s) <= 2.5 * min(fold_s),
        "n_redirects": n_redirects,
        "compact_s": compact_s,
        "exact_pre_compact": diff_pre == 0,
        "exact_post_compact": diff_post == 0,
    }
    assert diff_pre == 0 and diff_post == 0
    print(json.dumps(out), flush=True)
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
