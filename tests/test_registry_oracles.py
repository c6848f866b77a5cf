"""Every oracle-bearing registry entry vs its DuckDB twin at sf0.001.

This mirrors exactly what the round driver grades at sf0.01
(row-count + schema + value-hash), so a mismatch here is caught before
the round instead of in CORRECTNESS_r{N}.json. Rows-only entries
(oracle=None) are smoke-run for schema stability.
"""

import pytest

from dragnet_spark.registry import REGISTRY
from tests.conftest import duck_set, rows_set

_WITH_ORACLE = sorted(n for n, e in REGISTRY.items() if e.oracle is not None)
_ROWS_ONLY = sorted(n for n, e in REGISTRY.items() if e.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_matches_oracle(spark, sf_dir, oracle, name):
    entry = REGISTRY[name]
    got = rows_set(entry.spark(spark, sf_dir))
    want = duck_set(oracle, entry.oracle)
    assert got == want, (
        f"{name}: {len(got)} spark rows vs {len(want)} oracle rows; "
        f"spark-only={sorted(got - want)[:3]} oracle-only={sorted(want - got)[:3]}"
    )


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    entry = REGISTRY[name]
    df = entry.spark(spark, sf_dir)
    assert df.count() >= 0 and df.columns


def test_bench_queries_all_registered():
    """bench.py silently skips unknown names; a typo would quietly
    shrink the benchmark. Pin every headline query to the registry."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [n for n in bench.BENCH_QUERIES if n not in REGISTRY]
    assert not missing, missing


def test_emb_lsh_bucketed_oracle_matches_allpairs(oracle):
    """dedup_embedding_lsh's graded oracle is the bucketed SRP
    pipeline (tractable at 100×); this pins its RECALL: at small SF
    the bucketed form must equal the exhaustive all-pairs form —
    identical vectors collide in every band, so nothing at
    threshold 0.9 is missed."""
    from dragnet_spark.registry.curation import (
        _EMB_COS_U,
        _EMB_LSH_T,
        _EMB_LSH_UNION,
        _emb_lsh_oracle,
    )

    allpairs = f"""
    WITH u AS ({_EMB_LSH_UNION})
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_EMB_COS_U} AS cosine
    FROM u a JOIN u b ON a.vec_id < b.vec_id
    WHERE {_EMB_COS_U} >= {_EMB_LSH_T}
    """
    got = duck_set(oracle, _emb_lsh_oracle())
    want = duck_set(oracle, allpairs)
    assert got == want and len(want) > 0
