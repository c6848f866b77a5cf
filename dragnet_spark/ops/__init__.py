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
