"""PIPELINE.md's end-to-end curation recipe, executed.

The guide is user-facing documentation; this test runs the same
stage chain so an API rename or semantic change that would break the
documented recipe fails here first.
"""

from pyspark.sql import functions as F

from dragnet_spark.ops import dedup, packing, sampling, text
from dragnet_spark.ops.graph import dedup_cluster_assignments
from dragnet_spark.sources.tables import load_table


def test_pipeline_guide_recipe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    q = text.quality_columns("text")
    docs = docs.withColumns(dict(q))
    docs = docs.filter((F.col("n_tokens") >= 20) & (F.col("punct_ratio") < 0.3))

    rep = text.repetition_stats(docs)
    docs = docs.join(rep.filter("repetition_flag = 0").select("doc_id"), "doc_id")

    lp = text.unigram_logprob(docs)
    docs = docs.join(lp.filter("mean_logp > -9.5").select("doc_id"), "doc_id")

    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.8)
    assign = dedup_cluster_assignments(docs, "doc_id", pairs)
    docs = docs.join(assign.filter("is_canonical").select("doc_id"), "doc_id")

    spans = text.duplicate_spans(docs, n=8)
    docs = docs.join(spans.filter("dup_frac < 0.5").select("doc_id"), "doc_id")

    hits = text.benchmark_overlap(docs, n=8)
    docs = docs.join(
        hits.filter("contaminated = 1").select("doc_id"), "doc_id", "left_anti"
    )

    split = sampling.hash_split(docs, "doc_id", test_frac=0.01)
    docs = docs.withColumn("n_tok", text.token_count("text"))
    packed = packing.pack_sequences(docs, "doc_id", "n_tok", budget=2048)

    n_final = docs.count()
    assert 0 < n_final < n0  # every gate dropped something, none dropped all
    splits = {r["split"] for r in split.select("split").distinct().collect()}
    assert splits <= {"train", "test"}
    # every surviving doc is packed exactly once
    assert packed.select("doc_id").distinct().count() == n_final
