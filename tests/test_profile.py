"""One-pass profiler (ops/profile.py): exactness on narrow tables,
the wide-table approx-distinct posture (no Expand row multiplication
above the column threshold), and the mode override."""

from pyspark.sql import functions as F

from dragnet_spark.ops.profile import (
    EXACT_DISTINCT_MAX_COLS,
    profile_table,
)


def _narrow(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 2.5), (3, "a", 2.5)],
        "k long, s string, x double",
    )


def _wide(spark, n_cols):
    base = spark.range(500)
    cols = [
        (F.col("id") % (i + 2)).cast("long").alias(f"c{i}")
        for i in range(n_cols)
    ]
    return base.select(*cols)


def test_narrow_is_exact(spark):
    rows = {r["col_name"]: r for r in profile_table(_narrow(spark)).collect()}
    assert rows["k"]["n_distinct"] == 3 and rows["k"]["n_nulls"] == 0
    assert rows["s"]["n_distinct"] == 2 and rows["s"]["n_nulls"] == 1
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"
    assert rows["x"]["min_num"] == 1.5 and rows["x"]["max_num"] == 2.5


def test_wide_table_auto_switches_to_approx_and_drops_expand(spark):
    """Above EXACT_DISTINCT_MAX_COLS the profiler must plan WITHOUT
    Expand (exact multi-distinct replicates every scanned row once
    per aggregate — the 100-column profile of a 100 TB table must not
    become a 100-fold shuffle input) and the HLL estimates must sit
    within the configured relative error."""
    import warnings

    n = EXACT_DISTINCT_MAX_COLS + 8
    df = _wide(spark, n)
    # auto-selecting approx must SIGNAL the mode switch — n_distinct
    # silently becoming an estimate is data-dependent surprise
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        prof = profile_table(df)  # auto: approx above the threshold
        assert any("approx_count_distinct" in str(x.message) for x in w)
    import re

    plan = prof._jdf.queryExecution().executedPlan().toString()
    # no row multiplication: neither Catalyst's Expand nor the exact
    # path's per-column melt (a gid-keyed dedup aggregate)
    assert "Expand" not in plan
    assert not re.search(r"HashAggregate\(keys=\[gid", plan)
    rows = {r["col_name"]: r for r in prof.collect()}
    assert len(rows) == n
    for i in range(n):
        exact = i + 2  # c_i = id % (i+2) over 500 rows: i+2 distincts
        got = rows[f"c{i}"]["n_distinct"]
        assert abs(got - exact) <= max(2, 0.15 * exact), (i, got, exact)
    # narrow tables keep the exact path (the per-column melt)
    narrow_plan = (
        profile_table(_wide(spark, 4))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert re.search(r"HashAggregate\(keys=\[gid", narrow_plan)


def test_exact_path_hash_aggregates_without_sorts(spark):
    """The exact path's corpus-scale level (dedup of the melted
    (gid, value) pairs) must plan as a HashAggregate with map-side
    partial combine — the retired single-agg multi-count_distinct
    form's string min/max buffers forced SortAggregate plus two
    full-width sorts of the (cols+1)-multiplied scan (r14)."""
    import re

    plan = (
        profile_table(_narrow(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the (gid, value) dedup is hash-aggregated...
    assert re.search(r"HashAggregate\(keys=\[gid", plan)
    # ...and no operator sorts the multiplied corpus (SortAggregate
    # with empty grouping keys needs no Sort and is fine)
    assert not re.search(r"\bSort \[", plan)


def test_exact_path_mixed_types_and_all_null_column(spark):
    """Slot keying must stay injective per column across mixed types
    sharing a slot (int + timestamp both ride the long slot), and an
    all-null column must profile as 0 distinct / n nulls with null
    ranges."""
    import datetime

    df = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 1, 0, 0, 0), None, 1.0),
            (1, datetime.datetime(2024, 1, 2, 0, 0, 0), None, float("nan")),
            (2, None, None, -0.0),
            (3, datetime.datetime(2024, 1, 1, 0, 0, 0), None, 0.0),
        ],
        "i int, t timestamp, dead string, x double",
    )
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert rows["i"]["n_distinct"] == 3 and rows["i"]["n_nulls"] == 0
    assert rows["i"]["min_num"] == 1.0 and rows["i"]["max_num"] == 3.0
    assert rows["t"]["n_distinct"] == 2 and rows["t"]["n_nulls"] == 1
    assert rows["dead"]["n_distinct"] == 0 and rows["dead"]["n_nulls"] == 4
    assert rows["dead"]["min_str"] is None and rows["dead"]["max_str"] is None
    # grouping normalizes -0.0/NaN exactly like count_distinct's
    # rewrite: {1.0, nan, ±0.0} → 3 distincts
    assert rows["x"]["n_distinct"] == 3


def test_mode_override(spark):
    """exact_distinct=True pins exact counts even on a wide table;
    False pins the sketch even on a narrow one."""
    wide = _wide(spark, EXACT_DISTINCT_MAX_COLS + 4)
    exact_rows = {
        r["col_name"]: r["n_distinct"]
        for r in profile_table(wide, exact_distinct=True).collect()
    }
    for i in range(EXACT_DISTINCT_MAX_COLS + 4):
        assert exact_rows[f"c{i}"] == i + 2
    plan = (
        profile_table(_wide(spark, 3), exact_distinct=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
