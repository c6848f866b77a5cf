"""Frozen benchmark Bloom store (index/bloom.py): freeze the eval
gram set once, decontaminate later batches and streams against it."""

from pyspark.sql import functions as F

from dragnet_spark.index.bloom import (
    build_bloom_store,
    decontam_gate,
    load_bloom_meta,
    score_against_bloom_store,
)

BENCH = "the quick brown fox jumps over the lazy dog tonight"
CLEAN = "completely unrelated sentence with eight different tokens here"


def _bench(spark):
    return spark.createDataFrame([(BENCH,)], "text string")


def test_build_meta_and_score(spark, tmp_path):
    store = str(tmp_path / "bloom")
    meta = build_bloom_store(spark, _bench(spark), store, gram_n=8)
    assert load_bloom_meta(store) == meta
    assert meta["gram_n"] == 8
    # BENCH has 10 tokens -> 3 overlapping 8-grams
    assert meta["n_grams"] == 3

    batch = spark.createDataFrame(
        [
            (1, "intro words " + BENCH),  # contains all 3 bench grams
            (2, CLEAN),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in score_against_bloom_store(spark, store, batch).collect()
    }
    assert 3 not in got  # < 8 tokens: no gram evidence
    assert got[1].contaminated == 1 and got[1].n_hit_grams == 3
    assert got[2].contaminated == 0 and got[2].n_hit_grams == 0


def test_gate_drops_contaminated_keeps_clean_and_short(spark, tmp_path):
    store = str(tmp_path / "bloom")
    build_bloom_store(spark, _bench(spark), store, gram_n=8)
    batch = spark.createDataFrame(
        [(1, BENCH + " extra"), (2, CLEAN), (3, "too short")],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in decontam_gate(spark, store, batch).collect()
    )
    assert kept == [2, 3]


def test_gate_threshold_keeps_light_overlap(spark, tmp_path):
    store = str(tmp_path / "bloom")
    build_bloom_store(spark, _bench(spark), store, gram_n=8)
    # doc shares exactly 1 of its 9 grams with the bench set
    light = " ".join(BENCH.split()[:8]) + " " + CLEAN
    batch = spark.createDataFrame(
        [(1, light)], "doc_id long, text string"
    )
    scored = score_against_bloom_store(spark, store, batch).collect()[0]
    assert scored.n_hit_grams == 1 and 0 < scored.hit_frac < 0.2
    assert decontam_gate(spark, store, batch).count() == 0
    assert (
        decontam_gate(spark, store, batch, max_hit_frac=0.2).count() == 1
    )


def test_store_score_matches_adhoc_bloom(spark, sf_dir, tables):
    """Store probe == the ad-hoc benchmark_overlap_bloom run (which
    itself is oracle-checked against the exact twin)."""
    from dragnet_spark.ops.decontam import benchmark_overlap_bloom
    from dragnet_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    store = None
    import tempfile

    store = tempfile.mkdtemp(prefix="bloomstore_test_")
    build_bloom_store(
        spark, docs.filter(F.col("doc_id") % 97 == 0), store, gram_n=8
    )
    via_store = {
        tuple(r)
        for r in score_against_bloom_store(
            spark, store, docs.filter(F.col("doc_id") % 97 != 0)
        ).collect()
    }
    adhoc = {
        tuple(r)
        for r in benchmark_overlap_bloom(docs, n=8, bench_mod=97).collect()
    }
    assert via_store == adhoc and len(adhoc) > 0


def test_gate_composes_with_live_ingester(spark, tmp_path):
    """Streaming shape: the decontam gate runs inside foreachBatch
    ahead of the live-store ingester — contaminated docs never reach
    the sink or the fingerprint store."""
    from dragnet_spark.index.fingerprints import build_fingerprint_store
    from dragnet_spark.ops.text import fingerprint
    from dragnet_spark.streaming.pipeline import make_live_store_ingester

    store = str(tmp_path / "bloom")
    build_bloom_store(spark, _bench(spark), store, gram_n=8)
    fpstore = str(tmp_path / "fp")
    build_fingerprint_store(
        spark,
        spark.createDataFrame(
            [(1, "previously stored text here ok")],
            "doc_id long, text string",
        ),
        fpstore,
    )
    sink = str(tmp_path / "sink")
    ingest = make_live_store_ingester(
        fpstore, sink, "id", checkpoint=str(tmp_path / "ck")
    )

    def gated_ingest(batch_df, batch_id):
        keep = decontam_gate(spark, store, batch_df, id_col="id")
        ingest(keep, batch_id)

    for i in range(2):
        b = spark.createDataFrame(
            [
                (str(100 * i), CLEAN + f" batch {i}"),
                (str(100 * i + 1), BENCH + f" leaked copy {i}"),
            ],
            "id string, text string",
        )
        gated_ingest(
            b.select("id", "text", fingerprint("text").alias("__dn_fp")), i
        )
    sunk = {r.id for r in spark.read.parquet(sink).select("id").collect()}
    assert sunk == {"0", "100"}  # benchmark leaks gated before the sink
    n_store = spark.read.parquet(f"{fpstore}/fingerprints").count()
    assert n_store == 1 + 2  # seed + the two clean survivors


BENCH2 = "pack my box with five dozen brown jugs and a flask"


def test_attribution_names_the_leaked_benchmark(spark, tmp_path):
    store = str(tmp_path / "bloom")
    bench = spark.createDataFrame(
        [(BENCH, "mmlu"), (BENCH2, "gsm8k")], "text string, src string"
    )
    build_bloom_store(spark, bench, store, gram_n=8, src_col="src")

    from dragnet_spark.index.bloom import attribute_against_bloom_store

    batch = spark.createDataFrame(
        [
            (1, BENCH + " leaked here"),      # 3 grams from mmlu only
            (2, CLEAN),
            (3, BENCH + " and " + BENCH2),    # leaks from both
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.doc_id, r.bench_src): r.n_hit_grams
        for r in attribute_against_bloom_store(spark, store, batch).collect()
    }
    assert rows[(1, "mmlu")] == 3
    assert (1, "gsm8k") not in rows
    assert 2 not in {d for d, _ in rows}
    assert rows[(3, "mmlu")] == 3 and rows[(3, "gsm8k")] >= 3

    # the gate/score semantics are unchanged by attribution storage
    kept = sorted(
        r.doc_id for r in decontam_gate(spark, store, batch).collect()
    )
    assert kept == [2]


def test_attribution_requires_src_built_store(spark, tmp_path):
    import pytest

    from dragnet_spark.index.bloom import attribute_against_bloom_store

    store = str(tmp_path / "bloom")
    build_bloom_store(spark, _bench(spark), store, gram_n=8)
    batch = spark.createDataFrame(
        [(1, BENCH)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="src_col"):
        attribute_against_bloom_store(spark, store, batch).collect()


def test_bloom_store_in_fleet_view_never_compacts(spark, tmp_path):
    from dragnet_spark.index.maintain import plan_maintenance

    path = str(tmp_path / "fleet" / "bloom")
    build_bloom_store(spark, _bench(spark), path, gram_n=8)
    plan = {r["path"]: r for r in plan_maintenance(
        spark, str(tmp_path / "fleet"), max_files=0
    )}
    assert plan[path]["kind"] == "bloom"
    assert plan[path]["actions"] == []  # immutable: even max_files=0
    # healthy bitset: 3 grams in 2^20 bits -> fill ~1.4e-5, no advisory
    assert plan[path]["bloom_fill"] < 1e-4
    assert plan[path]["advisories"] == []


def test_bloom_saturation_yields_advisory_not_action(spark, tmp_path):
    from dragnet_spark.index.maintain import plan_maintenance

    path = str(tmp_path / "fleet" / "bloom")
    # 3 grams x k=2 into 16 bits: fill >= 1/4, est fpp way past 1%
    build_bloom_store(
        spark, _bench(spark), path, gram_n=8, m_bits=16, k=2
    )
    plan = {r["path"]: r for r in plan_maintenance(
        spark, str(tmp_path / "fleet")
    )}
    rec = plan[path]
    assert rec["bloom_est_fpp"] > 0.01
    assert rec["advisories"] == ["rebuild-recommended(larger m_bits)"]
    assert rec["actions"] == []  # advisory only: nothing to execute
