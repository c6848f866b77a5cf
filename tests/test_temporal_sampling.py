"""Unit semantics for the temporal / sampling / PII-scrub operators.

The registry oracle test proves engine parity on the real tables;
these pin the *semantics* on crafted inputs — tie rules, no-match
nulls, split stability — which parity alone can't distinguish.
"""

from pyspark.sql import functions as F

from dragnet_spark.ops.sampling import hash_fraction, hash_split, stratified_sample
from dragnet_spark.ops.temporal import asof_join
from dragnet_spark.ops.text import pii_count, redact_pii
from tests.conftest import rows_set


def test_asof_backward_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 99), (4, 20, 500)],
        "id long, k long, lts long",
    )
    right = spark.createDataFrame(
        [(10, 100, 1.0), (10, 200, 2.0), (30, 50, 9.0)],
        "k long, rts long, rval double",
    )
    got = {
        r["id"]: (r["rts"], r["rval"])
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            payload_cols=["rts", "rval"],
        ).collect()
    }
    assert got[1] == (100, 1.0)  # equal ts matches (inclusive)
    assert got[2] == (200, 2.0)  # latest at-or-before, not first
    assert got[3] == (None, None)  # before any right row
    assert got[4] == (None, None)  # key with no right rows at all


def test_asof_left_rows_preserved(spark):
    left = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 10).alias("lts")
    )
    right = spark.createDataFrame([(0, 5, 1.0)], "k long, rts long, rval double")
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload_cols=["rts", "rval"],
    )
    assert out.count() == 100  # left join: nothing dropped, nothing duplicated
    # k=0 → ids 0,7,...,98 (15 rows); id=0 has lts=0 < rts=5 → no match
    assert out.filter(F.col("rval").isNotNull()).count() == 14


def test_hash_split_is_stable_under_corpus_change(spark):
    full = hash_split(spark.range(1000), "id", 0.2, 0.1)
    half = hash_split(spark.range(500), "id", 0.2, 0.1)
    m_full = {r["id"]: r["split"] for r in full.collect()}
    m_half = {r["id"]: r["split"] for r in half.collect()}
    assert all(m_full[i] == m_half[i] for i in m_half)  # no reshuffling on growth
    counts = {s: sum(1 for v in m_full.values() if v == s) for s in set(m_full.values())}
    assert 150 < counts["test"] < 250 and 50 < counts["val"] < 150


def test_hash_fraction_salt_decorrelates(spark):
    df = spark.range(2000).select(
        "id",
        (hash_fraction("id", "a") < 0.5).alias("da"),
        (hash_fraction("id", "b") < 0.5).alias("db"),
    )
    both = df.filter("da AND db").count()
    assert 400 < both < 600  # independent draws: ~25% of 2000


def test_stratified_sample_rates(spark):
    df = spark.range(4000).select(
        "id", F.when(F.col("id") % 2 == 0, "keep").otherwise("thin").alias("s")
    )
    out = stratified_sample(df, "id", {"keep": 1.0, "thin": 0.1}, "s")
    by = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert by["keep"] == 2000 and 120 < by["thin"] < 280


def test_redact_pii_rules(spark):
    rows = [
        (1, "reach a.b_c+x@foo-bar.io or 555-123-4567 at 10.0.0.1 ok"),
        (2, "no pii"),
        (3, "v4.2.1.3 is a version but 8.8.8.8 is an ip"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = rows_set(
        df.select("id", redact_pii("t").alias("r"), pii_count("t").alias("n"))
    )
    assert (1, "reach <EMAIL> or <PHONE> at <IP> ok", 3) in got
    assert (2, "no pii", 0) in got
    # \b protects the version-like token: no word boundary inside "v4",
    # so only the bare dotted quad redacts
    assert (3, "v4.2.1.3 is a version but <IP> is an ip", 1) in got


def test_approx_variants_within_tolerance(spark, sf_dir):
    """The sketch entries carry their tolerance contract in-query
    (round-5): every invariant flag must come back TRUE and the exact
    column must agree with the standalone exact twin. The raw
    approx_percentile values are additionally value-checked here
    against the exact percentiles (neighboring-value gap)."""
    from pyspark.sql import functions as SF

    from dragnet_spark.registry import REGISTRY
    from dragnet_spark.sources.tables import load_table

    rows = (
        REGISTRY["events_distinct_users_by_type_approx"]
        .spark(spark, sf_dir)
        .collect()
    )
    exact_d = {
        r["event_type"]: r["n_distinct"]
        for r in REGISTRY["events_distinct_users_by_type"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert {r["event_type"] for r in rows} == exact_d.keys()
    for r in rows:
        assert r["approx_ok"], r
        assert r["n_distinct_exact"] == exact_d[r["event_type"]], r

    prows = (
        REGISTRY["events_value_percentiles_approx"].spark(spark, sf_dir).collect()
    )
    assert prows
    for r in prows:
        assert r["p50_rank_ok"] and r["p95_rank_ok"], r

    # raw sketch values vs exact percentiles (value-level slack)
    approx_p = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            SF.approx_percentile("value", SF.lit(0.5), SF.lit(10000)).alias("p50"),
            SF.approx_percentile("value", SF.lit(0.95), SF.lit(10000)).alias("p95"),
        )
        .collect()
    }
    exact_p = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in REGISTRY["events_value_percentiles"].spark(spark, sf_dir).collect()
    }
    for k, (e50, e95) in exact_p.items():
        a50, a95 = approx_p[k]
        assert abs(a50 - e50) <= 0.05 * max(abs(e50), 1), (k, a50, e50)
        assert abs(a95 - e95) <= 0.05 * max(abs(e95), 1), (k, a95, e95)


def test_asof_randomized_parity_with_duckdb(spark):
    """asof_join agrees with DuckDB's native ASOF LEFT JOIN on random
    keyed time series (seeded): backward-inclusive semantics, ties,
    missing keys, empty right groups."""
    import random

    import duckdb
    import pandas as pd

    rng = random.Random(1234)
    left = [
        (i, rng.randrange(8), rng.randrange(100))
        for i in range(300)
    ]
    right = [
        (rng.randrange(10), rng.randrange(100), float(i))
        for i in range(200)
    ]
    # dedup right on (k, rts): keep max payload — same rule both engines
    rmap = {}
    for k, rts, v in right:
        rmap[(k, rts)] = max(rmap.get((k, rts), float("-inf")), v)
    right = [(k, rts, v) for (k, rts), v in rmap.items()]

    ldf = spark.createDataFrame(left, "id long, k long, lts long")
    rdf = spark.createDataFrame(right, "k long, rts long, rval double")
    got = rows_set(
        asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            payload_cols=["rts", "rval"],
        )
    )

    con = duckdb.connect()
    con.register("l", pd.DataFrame(left, columns=["id", "k", "lts"]))
    con.register("r", pd.DataFrame(right, columns=["k", "rts", "rval"]))
    want = {
        tuple(t)
        for t in con.execute(
            """
            SELECT l.id, l.k, l.lts, r.rts, r.rval
            FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.lts >= r.rts
            """
        ).fetchall()
    }
    assert got == want


def test_range_join_semantics(spark):
    """Half-open boundaries, overlap multiplicity, and bucket-width
    independence."""
    from dragnet_spark.ops.temporal import range_join

    fact = spark.createDataFrame(
        [(1, 10), (2, 19), (3, 20), (4, 25), (5, 99)], "fid long, v long"
    )
    dim = spark.createDataFrame(
        [("a", 10, 20), ("b", 15, 30)], "name string, s long, e long"
    )
    for width in (1, 7, 100):
        got = {
            (r["fid"], r["name"])
            for r in range_join(fact, dim, "v", "s", "e", width).collect()
        }
        assert got == {
            (1, "a"),            # v=10: start inclusive
            (2, "a"), (2, "b"),  # v=19: overlap → two rows
            (3, "b"),            # v=20: end exclusive for a
            (4, "b"),
        }, f"width={width}"


def test_plan_shapes_stay_scalable(spark, sf_dir):
    """Plan-quality regression net: the joins that must never be
    nested-loop stay hash/sort-merge, and sampling stays a narrow
    filter (no shuffle)."""
    from dragnet_spark.registry import REGISTRY

    def plan_of(name):
        return (
            REGISTRY[name]
            .spark(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    for name in ("asof_purchase_last_click", "orders_in_promo_windows"):
        p = plan_of(name)
        assert "BroadcastNestedLoop" not in p and "Cartesian" not in p, name

    # the range join must broadcast the interval dim, never the fact:
    # BuildLeft here would mean Catalyst picked the orders table as the
    # broadcast side (fatal when the fact is the 100 TB table)
    p = plan_of("orders_in_promo_windows")
    assert "BuildRight" in p and "BuildLeft" not in p

    # star joins keep their dims broadcast (no lineitem-side shuffle
    # for the dim join) and never degenerate to nested-loop
    for name in ("q5_revenue_by_nation", "q14_promo_revenue_share",
                 "events_p99_outliers"):
        p = plan_of(name)
        assert "BroadcastHashJoin" in p, name
        assert "BroadcastNestedLoop" not in p and "Cartesian" not in p, name

    # the candidate-generation self-joins (LSH bands, deletion
    # variants, shared fingerprints) must stay equi-joins — a
    # nested-loop here is the O(n²) cross product they exist to avoid
    for name in ("dedup_minhash_lsh", "dedup_embedding_lsh",
                 "customers_fuzzy_name_pairs", "split_leakage_report",
                 "dedup_winnow_overlap"):
        p = plan_of(name)
        assert "BroadcastNestedLoop" not in p and "Cartesian" not in p, name

    p = plan_of("sample_stratified_by_lang")
    assert "Exchange" not in p  # pure filter+project: no shuffle at all


def test_range_join_randomized_parity_with_duckdb(spark):
    """range_join agrees with a plain BETWEEN join on random intervals
    (seeded): zero-width and huge intervals, negative values, heavy
    overlap — across bucket widths."""
    import random

    import duckdb
    import pandas as pd

    from dragnet_spark.ops.temporal import range_join

    rng = random.Random(99)
    fact = [(i, rng.randrange(-50, 150)) for i in range(400)]
    dim = []
    for j in range(60):
        s = rng.randrange(-60, 140)
        dim.append((j, s, s + rng.choice([0, 1, 3, 10, 80])))

    fdf = spark.createDataFrame(fact, "fid long, v long")
    ddf = spark.createDataFrame(dim, "did long, s long, e long")

    con = duckdb.connect()
    con.register("f", pd.DataFrame(fact, columns=["fid", "v"]))
    con.register("d", pd.DataFrame(dim, columns=["did", "s", "e"]))
    want = {
        tuple(t)
        for t in con.execute(
            "SELECT fid, did FROM f JOIN d ON v >= s AND v < e"
        ).fetchall()
    }
    for width in (1, 7, 64):
        got = {
            (r["fid"], r["did"])
            for r in range_join(fdf, ddf, "v", "s", "e", width).collect()
        }
        assert got == want, f"width={width}"


def test_asof_null_payload_carries_row_not_column(spark):
    """A right row whose payload is NULL still wins as the latest row
    (ASOF semantics): payload columns must come from ONE right row,
    never mixed across rows by per-column null-skipping."""
    left = spark.createDataFrame([(1, 10, 100)], "id long, k long, lts long")
    right = spark.createDataFrame(
        [(10, 50, 5.0), (10, 80, None)], "k long, rts long, rval double"
    )
    [row] = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload_cols=["rts", "rval"],
    ).collect()
    assert (row["rts"], row["rval"]) == (80, None)  # not (80, 5.0)


def test_asof_null_right_ts_never_matches(spark):
    """A right row with NULL timestamp cannot satisfy rts <= lts; it
    must not be carried into any left row (it would otherwise sort
    first and win as the earliest payload)."""
    left = spark.createDataFrame([(1, 10, 100)], "id long, k long, lts long")
    right = spark.createDataFrame(
        [(10, None, 9.0)], "k long, rts long, rval double"
    )
    [row] = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        payload_cols=["rts", "rval"],
    ).collect()
    assert (row["rts"], row["rval"]) == (None, None)


def test_sliding_twin_non_divisible_window(spark):
    """The DuckDB sliding-count twin matches Spark when length is not
    a multiple of slide (ceil windows, partial last window)."""
    import duckdb
    import pandas as pd

    from dragnet_spark.ops.temporal import sliding_window_agg, sliding_window_count_sql

    ts = [0, 1, 2, 5, 9, 10, 29, 30]
    df = spark.createDataFrame([(t,) for t in ts], "e long").select(
        F.timestamp_seconds("e").alias("ts"), "e"
    )
    got = {
        (r["ws"], r["n"])
        for r in sliding_window_agg(
            df, "ts", 10, 3, F.count(F.lit(1)).cast("long").alias("n")
        ).select("ws", "n").collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"e": ts}))
    want = {
        tuple(r)
        for r in con.execute(sliding_window_count_sql("t", "e", 10, 3)).fetchall()
    }
    assert got == want
