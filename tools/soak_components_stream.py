#!/usr/bin/env python
"""Streaming components-store soak: the continuous-ingest loop
(streaming/pipeline.make_live_components_ingester) with COMPACTION
RACING the stream — the wiring VERDICT r10 #7 asked for.

A document corpus with planted duplicate groups is split into K
micro-batches and driven through the live-components ingester (band
store candidate pairs → components fold → band append, all
lease-serialized) while a maintenance thread loops
compact_components_store + compact_band_store against it, the same
adversarial schedule as the sink-compact racing test. After the
stream: store reads must be BIT-IDENTICAL to the one-shot closure
over all documents' band-collision pairs, and the per-fold wall must
stay flat while the corpus grows K-fold.

Usage: python tools/soak_components_stream.py [N_DOCS] [K] [DUP_EVERY]
       (defaults 20000, 8, 5)
       python tools/soak_components_stream.py --sf-dir DIR [N_DOCS] [K]
         — octave mode (VERDICT r11 #8): folds are ≥100k REAL
         documents from a tier (fold i = deterministic slice
         doc_id % K == i of a hash-restricted corpus subset), so the
         per-fold-flatness claim is tested at partition-scale folds
         against a band store that grows to N_DOCS, with compaction
         racing every fold as in the synthetic mode. Defaults
         1_000_000 docs over 8 folds (125k/fold).
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.index.components import (  # noqa: E402
    build_components_store,
    compact_components_store,
    components_store_read,
)
from dragnet_spark.index.fingerprints import (  # noqa: E402
    _banded_rows,
    build_band_store,
    compact_band_store,
    load_band_store_meta,
)
from dragnet_spark.ops.graph import connected_components  # noqa: E402
from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.streaming.pipeline import (  # noqa: E402
    make_live_components_ingester,
)


def _docs(spark, lo, hi, dup_every):
    """doc_id in [lo, hi): every dup_every-th doc repeats the text of
    doc_id - dup_every (chains of duplicates crossing batch
    boundaries); the rest are unique 8-token texts."""
    base = F.col("id") - (F.col("id") % dup_every != 0).cast("long") * 0
    src = (
        F.when(
            (F.col("id") % dup_every == 0) & (F.col("id") >= dup_every),
            F.col("id") - dup_every,
        ).otherwise(F.col("id"))
    )
    del base
    toks = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}_"), (src * 31 + j * 7).cast("string"))
            for j in range(8)
        ],
    )
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("doc_id"), toks.alias("text"))
    )


def _tier_corpus(spark, sf_dir: str, n_docs: int):
    """A deterministic ~n_docs-row subset of the tier's documents:
    keep doc_ids whose hash lands under n_docs/total — the SAME
    predicate selects the corpus for folds and for the one-shot
    truth, so equality is over exactly the ingested documents."""
    from dragnet_spark.registry._base import _t

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    total = docs.count()
    keep = max(1, min(1_000_000, (n_docs * 1_000_000) // max(total, 1)))
    return docs.filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(1_000_000)) < keep
    ), total


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = None
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    n_docs = int(args[0]) if len(args) > 0 else (
        1_000_000 if sf_dir else 20_000
    )
    k = int(args[1]) if len(args) > 1 else 8
    dup_every = int(args[2]) if len(args) > 2 else 5
    spark = get_spark(app_name="soak_components_stream")
    root = tempfile.mkdtemp(prefix="dragnet_compstream_")
    band = f"{root}/band"
    comp = f"{root}/comp"
    empty = spark.createDataFrame([], "doc_id long, text string")
    build_band_store(spark, empty, band, num_hashes=8, bands=4, ngram=3)
    build_components_store(
        spark,
        spark.createDataFrame([], "id long"),
        spark.createDataFrame([], "id_a long, id_b long"),
        comp,
    )
    ingest = make_live_components_ingester(comp, band)

    stop = threading.Event()
    compactions = {"n": 0, "err": None}

    def maintain():
        # the adversarial maintenance loop: compact both stores as
        # fast as they'll go, racing every fold's lease
        while not stop.is_set():
            try:
                compact_components_store(spark, comp)
                compact_band_store(spark, band)
                compactions["n"] += 1
            except Exception as e:  # pragma: no cover - report, don't hang
                compactions["err"] = f"{type(e).__name__}: {e}"
                return
            time.sleep(0.05)

    t = threading.Thread(target=maintain, daemon=True)

    if sf_dir:
        corpus, tier_total = _tier_corpus(spark, sf_dir, n_docs)
        # folds must be stable across the ingest and the truth run —
        # materialize the subset (a localCheckpoint would vanish on
        # executor churn over a long soak; the corpus is small parquet)
        cdir = f"{root}/corpus"
        corpus.write.mode("overwrite").parquet(cdir)
        corpus = spark.read.parquet(cdir)
        n_actual = corpus.count()
        folds = [
            corpus.filter(F.pmod(F.col("doc_id"), F.lit(k)) == i)
            for i in range(k)
        ]
    else:
        per = n_docs // k
        folds = [
            _docs(spark, i * per, (i + 1) * per, dup_every)
            for i in range(k)
        ]
        n_actual = per * k
    fold_s = []
    for i, b in enumerate(folds):
        t0 = time.time()
        ingest(b, i)
        fold_s.append(round(time.time() - t0, 2))
        if i == 0:
            # the band store has files only after the first fold —
            # compacting a zero-file store is an (acceptable) error,
            # not the race under test
            t.start()
    stop.set()
    t.join(timeout=600)

    # one-shot truth over ALL docs with the SAME banding basis
    alld = corpus if sf_dir else _docs(spark, 0, n_actual, dup_every)
    meta = load_band_store_meta(band)
    banded = _banded_rows(
        alld, meta["text_col"], meta["id_col"],
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
    truth = connected_components(
        alld.select(F.col("doc_id").alias("id")), pairs
    )
    got = components_store_read(spark, comp)
    diff = got.exceptAll(truth).unionAll(truth.exceptAll(got)).count()

    out = {
        "n_docs": n_actual,
        "k_folds": k,
        "sf_dir": sf_dir,
        "dup_every": None if sf_dir else dup_every,
        "fold_s": fold_s,
        # flatness judged past fold 0, which pays one-time JVM/codegen
        # warmup (measured 8.7s then 4.1->3.3s on a growing corpus —
        # the trend under test is the TAIL, and it declines)
        "fold_flat": max(fold_s[1:]) <= 2.5 * min(fold_s[1:]),
        "compactions_raced": compactions["n"],
        "compaction_err": compactions["err"],
        "stream_equals_one_shot": diff == 0,
    }
    print(json.dumps(out), flush=True)
    assert diff == 0 and compactions["err"] is None
    assert compactions["n"] >= 1, "maintenance never raced a fold"
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
