"""Incremental connected-components store (index/components.py):
fold == batch exactness in any batch order, chain merges across
folds, compaction, and read-path equivalence."""

# multi-minute store/ladder/soak tier: deselected from the default
# gate (pytest.ini addopts) so the driver's suite run completes;
# run with `pytest -m slow` (the builder's sessions do).
pytestmark = __import__("pytest").mark.slow

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


def _one_shot_truth(spark, band_store, all_docs):
    """The one-shot closure: LSH band-collision pairs over ALL docs at
    once, then connected components — what the incremental stream
    must equal bit-for-bit."""
    from dragnet_spark.index.fingerprints import (
        _banded_rows,
        load_band_store_meta,
    )

    meta = load_band_store_meta(band_store)
    banded = _banded_rows(
        all_docs, meta["text_col"], meta["id_col"],
        meta["num_hashes"], meta["bands"], meta["ngram"],
    )
    A = banded.select("band", "bhash", F.col("doc_id").alias("id_a"))
    B = banded.select("band", "bhash", F.col("doc_id").alias("id_b"))
    pairs = (
        A.join(B, ["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ids = all_docs.select(F.col("doc_id").alias("id"))
    return {
        (r["id"], r["component"])
        for r in connected_components(ids, pairs).collect()
    }


_DOC_BATCHES = [
    # batch 1: two singletons
    [(1, "alpha beta gamma delta epsilon zeta eta theta"),
     (2, "one two three four five six seven eight nine")],
    # batch 2: dup of doc 1 (cross-batch pair — only the live band
    # store can see it) + a fresh doc
    [(3, "alpha beta gamma delta epsilon zeta eta theta"),
     (4, "red orange yellow green blue indigo violet pink")],
    # batch 3: dup of doc 2, another dup of doc 1 (merges through the
    # redirect chain), and an isolated doc with no pair at all
    [(5, "one two three four five six seven eight nine"),
     (6, "alpha beta gamma delta epsilon zeta eta theta"),
     (7, "lonely document with no duplicate anywhere in the corpus")],
]


def test_live_components_ingester_folds_equal_one_shot(spark, tmp_path):
    """Driving the foreachBatch body directly, with COMPACTION RACING
    between folds: after every batch the store must read bit-identical
    to the one-shot closure over everything ingested so far, and an
    interleaved compact_components_store must change nothing."""
    from dragnet_spark.index.fingerprints import build_band_store
    from dragnet_spark.streaming.pipeline import (
        make_live_components_ingester,
    )

    band = str(tmp_path / "band")
    comp = str(tmp_path / "comp")
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_band_store(spark, empty, band, num_hashes=8, bands=4, ngram=3)
    build_components_store(
        spark, spark.createDataFrame([], "id long"),
        spark.createDataFrame([], "id_a long, id_b long"), comp,
    )
    ingest = make_live_components_ingester(comp, band)
    seen = []
    for i, batch in enumerate(_DOC_BATCHES):
        seen += batch
        ingest(
            spark.createDataFrame(batch, "doc_id long, text string"), i
        )
        if i == 1:
            compact_components_store(spark, comp)  # race the stream
        truth = _one_shot_truth(
            spark, band,
            spark.createDataFrame(seen, "doc_id long, text string"),
        )
        assert _read(spark, comp) == truth, f"after batch {i}"
    # final shape: {1,3,6} under 1, {2,5} under 2, 4 and 7 singletons
    assert _read(spark, comp) == {
        (1, 1), (3, 1), (6, 1), (2, 2), (5, 2), (4, 4), (7, 7),
    }


def test_stream_ingest_with_live_components_matches_one_shot(
    spark, tmp_path
):
    """The real writeStream wrapper: three files -> three micro-batches
    through stream_ingest_with_live_components; store reads equal the
    one-shot closure (and the replay ledger keeps a restart from
    re-folding)."""
    import json as _json
    import time as _time

    from dragnet_spark.index.fingerprints import build_band_store
    from dragnet_spark.streaming.pipeline import (
        stream_ingest_with_live_components,
    )

    band = str(tmp_path / "band")
    comp = str(tmp_path / "comp")
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_band_store(spark, empty, band, num_hashes=8, bands=4, ngram=3)
    build_components_store(
        spark, spark.createDataFrame([], "id long"),
        spark.createDataFrame([], "id_a long, id_b long"), comp,
    )
    d = tmp_path / "in"
    d.mkdir()
    for i, batch in enumerate(_DOC_BATCHES):
        (d / f"{i}.json").write_text(
            "\n".join(
                _json.dumps({"doc_id": di, "text": t}) for di, t in batch
            )
            + "\n"
        )
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = stream_ingest_with_live_components(
        sdf, comp, band, str(tmp_path / "ckpt")
    )
    from dragnet_spark.streaming.pipeline import drain_stream

    drain_stream(q, min_data_batches=3)
    q.stop()
    q.awaitTermination(60)
    all_docs = spark.createDataFrame(
        [r for b in _DOC_BATCHES for r in b], "doc_id long, text string"
    )
    assert _read(spark, comp) == _one_shot_truth(spark, band, all_docs)


def test_batch_of_only_new_ids(spark, tmp_path):
    path = str(tmp_path / "new")
    build_components_store(
        spark, _ids(spark, [0]), _pairs(spark, []), path
    )
    merge_components_batch(spark, _pairs(spark, [(100, 101)]), path)
    assert _read(spark, path) == {(0, 0), (100, 100), (101, 100)}
