"""Seeded randomized corpus fuzzer for the gram-level text operators.

repetition_stats / duplicate_spans / benchmark_overlap each keep a
DuckDB SQL twin in lockstep; the fixed registry corpus only exercises
the generator's document shape. This fuzzes structured corpora —
planted repeated grams, verbatim cross-doc spans, eval-slice overlap,
one-token and whitespace-heavy docs, mixed case — and checks the
Spark result equals the twin row-for-row. Seeds are deterministic, so
a failure reproduces from the test id.
"""

import random

import duckdb
import pandas as pd
import pytest

from dragnet_spark.ops import text as _text
from tests.conftest import rows_set

_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "data", "scan", "join", "merge", "the", "a",
]


def _gen_doc(rng: random.Random) -> str:
    style = rng.random()
    n = rng.randint(1, 40)
    toks = [rng.choice(_WORDS) for _ in range(n)]
    if style < 0.25 and n >= 4:
        # planted repetition: loop a short phrase
        phrase = toks[: rng.randint(2, 5)]
        toks = phrase * (n // max(len(phrase), 1) + 1)
    if rng.random() < 0.3:
        toks = [t.upper() if rng.random() < 0.5 else t for t in toks]
    sep = "  " if rng.random() < 0.2 else " "
    doc = sep.join(toks)
    if rng.random() < 0.2:
        doc = " " + doc + "  "
    return doc


def _gen_corpus(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    n_docs = rng.randint(5, 40)
    docs = [(i, _gen_doc(rng)) for i in range(n_docs)]
    # plant verbatim cross-doc spans (the duplicate_spans signal) and
    # eval-slice overlap (doc 0 is the benchmark slice for mod<=n_docs)
    for _ in range(rng.randint(0, 4)):
        a, b = rng.randrange(n_docs), rng.randrange(n_docs)
        if a == b:
            continue
        span = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(8, 14)))
        docs[a] = (docs[a][0], docs[a][1] + " " + span)
        docs[b] = (docs[b][0], span + " " + docs[b][1])
    return docs


_OPS = [
    (
        "repetition_stats",
        lambda df: _text.repetition_stats(df),
        lambda: _text.repetition_stats_sql("text"),
    ),
    (
        "duplicate_spans",
        lambda df: _text.duplicate_spans(df, n=5),
        lambda: _text.duplicate_spans_sql("text", n=5),
    ),
    (
        "benchmark_overlap",
        lambda df: _text.benchmark_overlap(df, n=6, bench_mod=7),
        lambda: _text.benchmark_overlap_sql("text", n=6, bench_mod=7),
    ),
]


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("opname,spark_fn,sql_fn", _OPS, ids=[o[0] for o in _OPS])
def test_text_op_matches_twin(spark, seed, opname, spark_fn, sql_fn):
    docs = _gen_corpus(seed)
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    got = rows_set(spark_fn(sdf))
    want = {tuple(r) for r in con.execute(sql_fn()).fetchall()}
    con.close()
    assert got == want, (
        f"{opname} seed={seed}: {len(got)} spark vs {len(want)} oracle; "
        f"spark-only={sorted(got - want)[:2]} oracle-only={sorted(want - got)[:2]}"
    )


@pytest.mark.parametrize("seed", range(8))
def test_bm25_matches_twin(spark, seed):
    """BM25 over fuzzed corpora equals its DuckDB twin row-for-row —
    exercises tf saturation, dl variance, absent terms, and the
    fixed-order pivot at every tie the small vocab manufactures."""
    docs = _gen_corpus(seed)
    terms = ["data", "scan", "theta"]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = rows_set(_text.bm25_rank(sdf, "text", "doc_id", terms, k=7))
    want = {
        tuple(r)
        for r in con.execute(_text.bm25_rank_sql("text", terms, k=7)).fetchall()
    }
    con.close()
    assert got == want, (
        f"bm25 seed={seed}: spark-only={sorted(got - want)[:2]} "
        f"oracle-only={sorted(want - got)[:2]}"
    )


def test_bm25_stuffed_doc_ranks_first(spark):
    """A document stuffed with the rarest query term outranks the
    rest; duplicate/empty query terms are rejected."""
    docs = [(i, "filler words only here") for i in range(6)]
    docs.append((99, "needle needle needle needle"))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    top = _text.bm25_rank(sdf, "text", "doc_id", ["needle", "filler"], k=3)
    first = top.orderBy("rank").first()
    assert first["doc_id"] == 99 and first["rank"] == 1

    with pytest.raises(ValueError):
        _text.bm25_rank(sdf, "text", "doc_id", [], k=3)
    with pytest.raises(ValueError):
        _text.bm25_rank(sdf, "text", "doc_id", ["a", "a"], k=3)
