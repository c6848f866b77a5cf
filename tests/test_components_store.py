"""Incremental connected-components store (index/components.py):
fold == batch exactness in any batch order, chain merges across
folds, compaction, and read-path equivalence."""

import itertools

import pytest

from pyspark.sql import functions as F

from dragnet_spark.index.components import (
    build_components_store,
    compact_components_store,
    components_store_read,
    merge_components_batch,
)
from dragnet_spark.ops.graph import connected_components


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _read(spark, path):
    return {
        (r["id"], r["component"])
        for r in components_store_read(spark, path).collect()
    }


def _batch_truth(spark, ids, pairs):
    return {
        (r["id"], r["component"])
        for r in connected_components(
            _ids(spark, ids), _pairs(spark, pairs)
        ).collect()
    }


def test_fold_equals_batch_any_order(spark, tmp_path):
    """Three batches folded in every order produce the same
    assignment as one closure over the concatenated pairs."""
    base_ids = [0, 1, 2, 3, 4, 5]
    base_pairs = [(0, 1), (2, 3)]
    batches = [
        [(1, 2)],          # merges {0,1} with {2,3}
        [(10, 11), (4, 5)],  # new ids + merge of two existing singles
        [(11, 3)],         # merges the new cluster into the big one
    ]
    all_ids = base_ids + [10, 11]
    truth = _batch_truth(
        spark, all_ids, base_pairs + [p for b in batches for p in b]
    )
    for perm in itertools.permutations(range(3)):
        path = str(tmp_path / ("store_" + "".join(map(str, perm))))
        build_components_store(
            spark, _ids(spark, base_ids), _pairs(spark, base_pairs), path
        )
        for i in perm:
            merge_components_batch(spark, _pairs(spark, batches[i]), path)
        assert _read(spark, path) == truth, perm


def test_chain_merges_flatten(spark, tmp_path):
    """Repeated folds that keep lowering a cluster's root exercise
    multi-hop redirect chains."""
    path = str(tmp_path / "chain")
    build_components_store(
        spark, _ids(spark, [5, 6, 7, 8, 9]), _pairs(spark, []), path
    )
    # each fold attaches the current cluster to a smaller root
    for a, b in [(8, 9), (7, 8), (6, 7), (5, 6)]:
        merge_components_batch(spark, _pairs(spark, [(a, b)]), path)
    assert _read(spark, path) == {(i, 5) for i in [5, 6, 7, 8, 9]}


def test_compact_folds_redirects_and_preserves_reads(spark, tmp_path):
    path = str(tmp_path / "cmp")
    build_components_store(
        spark, _ids(spark, [0, 1, 2, 3]), _pairs(spark, [(0, 1)]), path
    )
    merge_components_batch(spark, _pairs(spark, [(1, 2), (30, 31)]), path)
    before = _read(spark, path)
    compact_components_store(spark, path)
    assert _read(spark, path) == before
    # post-compact the redirect table is empty (reads skip the join)
    import os

    red = spark.read.parquet(os.path.join(path, "redirects"))
    assert red.count() == 0
    # and further folds keep working on the compacted base:
    # (3, 31) pulls the {30, 31} cluster under root 3
    merge_components_batch(spark, _pairs(spark, [(3, 31)]), path)
    after = _read(spark, path)
    assert (30, 3) in after and (31, 3) in after and (3, 3) in after


def test_compact_recovers_from_crashed_swap(spark, tmp_path):
    """A crash between compaction's two renames leaves the only copy
    of labels/ in .compact_old; the next compact must restore it
    instead of failing on the missing directory (and reads after
    recovery equal reads before the crash)."""
    import os

    path = str(tmp_path / "crash")
    build_components_store(
        spark, _ids(spark, [0, 1, 2]), _pairs(spark, [(0, 1)]), path
    )
    merge_components_batch(spark, _pairs(spark, [(1, 2)]), path)
    before = _read(spark, path)
    # simulate the crash window: labels/ renamed away, second rename
    # never happened
    labels = os.path.join(path, "labels")
    os.rename(labels, labels + ".compact_old")
    assert not os.path.exists(labels)
    compact_components_store(spark, path)
    assert _read(spark, path) == before
    assert not os.path.exists(labels + ".compact_old")
    assert not os.path.exists(labels + ".compact_tmp")


def test_batch_of_only_new_ids(spark, tmp_path):
    path = str(tmp_path / "new")
    build_components_store(
        spark, _ids(spark, [0]), _pairs(spark, []), path
    )
    merge_components_batch(spark, _pairs(spark, [(100, 101)]), path)
    assert _read(spark, path) == {(0, 0), (100, 100), (101, 100)}
