"""Beyond-reference operators for large-scale training-data pipelines.

The reference stops at filter→group→count; these modules add the
operations a 100 TB data-curation pipeline needs: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search over
embeddings, text analysis (language ID, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.

All hot paths are built-in Spark expressions (codegen'd, shuffle-
friendly, no driver-side state); Pandas UDFs appear only where
vectorized Python is genuinely needed (multimodal decode stubs,
blocked matrix similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy per-row stages (minhash over shingles, plane
    signatures, simhash bits) use every core: a small input that
    arrived as one or two file splits is round-robin repartitioned to
    the cluster's default parallelism. At real scale inputs already
    carry more partitions than cores, so this is a no-op — the 100 TB
    path stays shuffle-free.

    The probe reads the file list off the source relation
    (``df.inputFiles()``) instead of materializing ``df.rdd`` — the
    RDD conversion forced a per-call driver-side plan translation,
    which adds latency on every query at scale. A file-backed input
    with >= target files already parallelizes (Spark splits large
    files further by maxPartitionBytes, so this underestimates, never
    overestimates, the real split count); a non-file input (in-memory
    test frames, streaming micro-batches) is repartitioned
    unconditionally — those are exactly the small inputs the helper
    exists for.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nfiles = len(df.inputFiles())
    except Exception:
        nfiles = 0
    if nfiles >= target:
        return df
    return df.repartition(target)
