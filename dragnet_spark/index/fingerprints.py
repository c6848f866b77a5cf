"""Materialized fingerprint store: incremental exact-dedup for
continuous ingest — the build-once index pattern (index/build.py,
index/vector.py) applied to document identity.

A 100 TB corpus under continuous ingest cannot re-fingerprint itself
for every arriving batch. The store persists ONLY ``(fingerprint,
doc_id)`` — ~45 bytes/doc vs the corpus text — partitioned by the
fingerprint's first hex byte (256 buckets), so:

* **probe**: an arriving batch fingerprints itself (narrow map), joins
  the store on ``(fp_bucket, fp)``, and reports which new docs
  duplicate an existing one. The store side is pre-bucketed by the
  join key's prefix; a broadcast probe side enables dynamic partition
  pruning of untouched buckets, and the corpus TEXT is never read.
* **append**: survivors' fingerprints append into the same bucket
  layout (partition overwrite per bucket), keeping the store one
  cheap compaction away from optimal file counts — the event index's
  compaction discipline.

Reference parity: dragnet's index answers metric queries without
rescanning raw NDJSON (lib/dn.js build → index-scan); this store
answers "have we seen this document?" without rescanning corpus text.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dragnet_spark.ops import text as _text

STORE_DIR = "fingerprints"
BAND_DIR = "bands"
BAND_META = "_band_store.json"


def build_fingerprint_store(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize ``(fp_bucket, fp, doc_id)`` for every document."""
    (
        docs.select(
            _text.fingerprint(text_col).alias("fp"),
            F.col(id_col).alias("doc_id"),
        )
        .withColumn("fp_bucket", F.substring("fp", 1, 2))
        .write.mode("overwrite")
        .partitionBy("fp_bucket")
        .parquet(os.path.join(path, STORE_DIR))
    )


def append_fingerprints(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append a new batch's fingerprints into the same bucket layout."""
    (
        docs.select(
            _text.fingerprint(text_col).alias("fp"),
            F.col(id_col).alias("doc_id"),
        )
        .withColumn("fp_bucket", F.substring("fp", 1, 2))
        .write.mode("append")
        .partitionBy("fp_bucket")
        .parquet(os.path.join(path, STORE_DIR))
    )


#: Above this many probe rows the batch is no longer "small": a forced
#: broadcast would collect it all to the driver. ~45 B/row of
#: fingerprint+id keeps 2M rows under ~100 MB serialized — within
#: Spark's default broadcast comfort zone with headroom.
MAX_BROADCAST_PROBES = 2_000_000


def probe_new_documents(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_probes: int = MAX_BROADCAST_PROBES,
) -> DataFrame:
    """(doc_id, fp, dup_of, is_duplicate) for an arriving batch.

    ``dup_of`` is the minimum existing doc_id sharing the fingerprint
    (NULL for fresh docs). The probe side is broadcast only when its
    fingerprint projection is small (≤ ``max_broadcast_probes`` rows,
    counted on the narrow (id, fp) projection — the text column never
    materializes for the count): Spark's dynamic partition pruning
    then skips store buckets the batch doesn't hash into. A larger
    batch falls back to a shuffle hash join on (fp_bucket, fp) — the
    store is already bucketed by the key prefix — instead of
    collecting an unbounded batch through the driver.
    """
    store = spark.read.parquet(os.path.join(path, STORE_DIR)).select(
        "fp_bucket", "fp", F.col("doc_id").alias("existing_id")
    )
    probes = new_docs.select(
        F.col(id_col).alias("doc_id"),
        _text.fingerprint(text_col).alias("fp"),
    ).withColumn("fp_bucket", F.substring("fp", 1, 2))
    # Size gate: limit(n+1).count() touches at most n+1 narrow rows —
    # it never pays for the full batch when the batch is huge.
    small = (
        probes.limit(max_broadcast_probes + 1).count()
        <= max_broadcast_probes
    )
    probe_side = F.broadcast(probes) if small else probes
    hits = (
        store.join(probe_side, ["fp_bucket", "fp"])
        .groupBy("doc_id", "fp")
        .agg(F.min("existing_id").alias("dup_of"))
    )
    return (
        probes.select("doc_id", "fp")
        .join(hits, ["doc_id", "fp"], "left")
        .select(
            "doc_id",
            "fp",
            "dup_of",
            F.col("dup_of").isNotNull().alias("is_duplicate"),
        )
    )


# ------------------------------------------------- minhash band store
#
# The exact store answers "have we seen THIS document"; the band store
# answers "have we seen something NEAR this document": (band, bhash,
# doc_id) rows under the same minhash-LSH banding as
# ops/dedup.minhash_lsh_pairs (identical seeded coeffs + band md5, so
# store keys and any batch LSH run agree bit-for-bit). Partitioned by
# band id, so probes and per-band anti-joins partition-prune to the
# slice they need; only 16-byte-ish hashes ever persist or shuffle.


def _banded_rows(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    ngram: int,
) -> DataFrame:
    """(doc_id, band, bhash) rows for every document with shingles —
    the ONE place the banding row shape is defined, so build, append,
    and probe can never silently diverge on band keys. The band array
    is computed once per row (ops/dedup.minhash_band_array) and
    ``posexplode`` unpacks it: position IS the band id; a NULL array
    (no shingles) emits no rows. ``spread`` first: the band hashes are
    interpreted HOF expressions (CPU-heavy per row) and a one-file
    input would otherwise run on a couple of cores — a no-op at real
    scale."""
    from dragnet_spark.ops import spread
    from dragnet_spark.ops.dedup import minhash_band_array

    arr = minhash_band_array(text_col, num_hashes, bands, ngram)
    return (
        spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(arr).alias("band", "bhash"),
        )
        .filter(F.col("bhash").isNotNull())
    )


def build_band_store(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    ngram: int = 3,
) -> dict:
    """Materialize (band, bhash, doc_id) for every document with at
    least one shingle. Banding params persist in ``_band_store.json``
    so appends and probes can never silently use mismatched keys.

    """
    (
        _banded_rows(docs, text_col, id_col, num_hashes, bands, ngram)
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(os.path.join(path, BAND_DIR))
    )
    meta = {
        "version": "1.0",
        "num_hashes": num_hashes,
        "bands": bands,
        "ngram": ngram,
        "text_col": text_col,
        "id_col": id_col,
    }
    with open(os.path.join(path, BAND_META), "w") as f:
        json.dump(meta, f)
    return meta


def load_band_store_meta(path: str) -> dict:
    with open(os.path.join(path, BAND_META)) as f:
        return json.load(f)


def append_band_keys(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
) -> None:
    """Append a new batch's band keys into the same band layout, with
    the PERSISTED banding params (mirrors append_vector_index's
    persisted-centroid discipline)."""
    meta = load_band_store_meta(path)
    (
        _banded_rows(
            docs, meta["text_col"], meta["id_col"],
            meta["num_hashes"], meta["bands"], meta["ngram"],
        )
        .write.mode("append")
        .partitionBy("band")
        .parquet(os.path.join(path, BAND_DIR))
    )


def probe_near_duplicates(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
) -> DataFrame:
    """(doc_id, n_band_hits, dup_of, is_near_duplicate) for an
    arriving batch: a doc is a near-duplicate CANDIDATE of the stored
    corpus when any of its band keys collides with a stored key —
    minhash-LSH semantics, so at the store's (num_hashes, bands) a
    pair at Jaccard j collides somewhere with prob 1-(1-j^r)^b.
    ``dup_of`` is the minimum stored doc_id among colliding bands.
    Only (band, bhash) ride the join; text never leaves the scan.

    ``n_band_hits`` counts DISTINCT ``(band, bhash, existing_id)``
    collisions — the matched rows are deduplicated after the join
    (bounded work: only hits, never the store), so a re-appended
    document or a pre- vs post-compaction store cannot change any
    probe output. That makes every field of this result invariant
    under ``append`` replays and ``compact_band_store``."""
    meta = load_band_store_meta(path)
    banded = _banded_rows(
        new_docs, meta["text_col"], meta["id_col"],
        meta["num_hashes"], meta["bands"], meta["ngram"],
    )
    ids = new_docs.select(F.col(meta["id_col"]).alias("doc_id"))
    store = spark.read.parquet(os.path.join(path, BAND_DIR)).select(
        "band", "bhash", F.col("doc_id").alias("existing_id")
    )
    hits = (
        store.join(banded, ["band", "bhash"])
        .dropDuplicates(["doc_id", "band", "bhash", "existing_id"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_band_hits"),
            F.min("existing_id").alias("dup_of"),
        )
    )
    return (
        ids.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_band_hits", F.lit(0)).alias("n_band_hits"),
            "dup_of",
            F.col("dup_of").isNotNull().alias("is_near_duplicate"),
        )
    )


# ---------------------------------------------------------- compaction


def _staged_rewrite(
    df,
    part_col: str,
    dest: str,
    key_col: str,
    files_per_partition: int = 1,
) -> None:
    """Stage-then-swap rewrite (index/build.compact_index discipline):
    Spark cannot overwrite the parquet tree it is reading, so write to
    ``<dest>.compact_tmp`` beside the store (same filesystem), then
    swap directories.

    ``files_per_partition`` bounds output files per partition dir by
    routing each (partition, key-hash slice) to one task. The default
    1 is right locally and for the 256-bucket fp store; for the 8-way
    band store at real scale, pass enough slices that a slice is one
    task's worth of data — one file per band would funnel 1/8 of the
    store through a single task."""
    import shutil

    stage = dest + ".compact_tmp"
    old = dest + ".compact_old"
    # a previous compaction that crashed between its renames can leave
    # either sibling behind; clear them so the swap cannot fail
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    slice_col = F.pmod(
        F.xxhash64(F.col(key_col)), F.lit(files_per_partition)
    )
    try:
        (
            df.repartition(F.col(part_col), slice_col)
            .write.mode("overwrite")
            .partitionBy(part_col)
            .parquet(stage)
        )
        os.rename(dest, old)
        os.rename(stage, dest)
        shutil.rmtree(old, ignore_errors=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def compact_fingerprint_store(
    spark: SparkSession, path: str, files_per_partition: int = 1
) -> None:
    """Periodic maintenance for an append-heavy store: collapse each
    fingerprint to its minimum doc_id and rewrite one file per bucket.

    Answer-preserving by construction: ``probe_new_documents`` reports
    ``dup_of = min(existing_id)`` per fingerprint, so dropping the
    non-minimum rows can never change a probe result — it only shrinks
    the store (duplicate ingests collapse) and bounds file counts.
    NOT safe concurrently with an active appender or a running
    streaming query holding the old file listing (the event-index
    compact contract: pause, compact, restart).
    """
    dest = os.path.join(path, STORE_DIR)
    df = spark.read.parquet(dest)
    compacted = df.groupBy("fp_bucket", "fp").agg(
        F.min("doc_id").alias("doc_id")
    )
    _staged_rewrite(
        compacted, "fp_bucket", dest, "fp", files_per_partition
    )


def compact_band_store(
    spark: SparkSession, path: str, files_per_partition: int = 1
) -> None:
    """Same maintenance for the band store: distinct (band, bhash,
    doc_id) rows — repeated appends of the same document collapse —
    rewritten to ``files_per_partition`` files per band. Answer-
    preserving: ``probe_near_duplicates`` deduplicates matched rows
    before counting, so every probe field (including ``n_band_hits``)
    is identical against the pre- and post-compaction store; keep-min
    would be wrong here because distinct stored doc_ids sharing a
    band key are REAL collisions the count must retain. At real scale
    size
    ``files_per_partition`` so one slice is one task's worth — the
    band dimension is only 8-wide, so the default 1 funnels 1/8 of
    the store per task (fine locally, a bottleneck at 100 TB)."""
    dest = os.path.join(path, BAND_DIR)
    df = spark.read.parquet(dest)
    _staged_rewrite(
        df.select("band", "bhash", "doc_id").distinct(), "band", dest,
        "bhash", files_per_partition,
    )
