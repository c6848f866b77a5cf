"""KMV distinct sketch (ops/sketch.py): exactness below k, estimate
accuracy, partition-invariance of the bottom-k merge, DuckDB twin
parity."""

import duckdb
import pytest

from pyspark.sql import functions as F

from dragnet_spark.ops.sketch import (
    HASH_BITS,
    kmv_distinct,
    kmv_distinct_sql,
    kmv_hash,
)


def _vals(spark, words, parts=1):
    df = spark.createDataFrame([("g", w) for w in words], "grp string, v string")
    return df.repartition(parts)


def test_hash_range(spark):
    df = _vals(spark, [f"w{i}" for i in range(200)])
    mm = df.select(
        F.min(kmv_hash("v")).alias("lo"), F.max(kmv_hash("v")).alias("hi")
    ).collect()[0]
    assert 0 <= mm["lo"] <= mm["hi"] < (1 << HASH_BITS)


def test_exact_below_k(spark):
    words = [f"tok{i}" for i in range(50)] * 3  # 50 distinct, k=256
    out = kmv_distinct(_vals(spark, words), "v", ["grp"], k=256).collect()
    assert out[0]["est_distinct"] == 50


def test_estimate_accuracy_and_partition_invariance(spark):
    words = [f"token-{i}" for i in range(5000)]
    one = kmv_distinct(_vals(spark, words, parts=1), "v", ["grp"], k=256)
    many = kmv_distinct(_vals(spark, words, parts=13), "v", ["grp"], k=256)
    e1 = one.collect()[0]["est_distinct"]
    e2 = many.collect()[0]["est_distinct"]
    # bottom-k merge is exact: partitioning must not change the sketch
    assert e1 == e2
    assert abs(e1 - 5000) / 5000 < 0.2  # ~6% expected at k=256


def test_k_validation(spark):
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_distinct(_vals(spark, ["a"]), "v", ["grp"], k=1)


def test_null_groups_and_null_values(spark):
    """NULL group keys form a group (SQL GROUP BY semantics — the
    pandas prune must not dropna them); NULL values are excluded like
    COUNT(DISTINCT) excludes them, identically on both engines."""
    rows = (
        [("a", f"w{i}") for i in range(20)]
        + [(None, f"n{i}") for i in range(30)]  # NULL-keyed group
        + [("a", None), (None, None)]  # NULL values: ignored
    )
    df = spark.createDataFrame(rows, "grp string, v string").repartition(7)
    got = {
        r["grp"]: r["est_distinct"]
        for r in kmv_distinct(df, "v", ["grp"], k=16).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp STRING, v STRING)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = kmv_distinct_sql("v", ["grp"], "SELECT grp, v FROM t", k=16)
    want = {g: e for g, e in con.execute(sql).fetchall()}
    assert got == want
    assert got["a"] == 20  # exact below k; the NULL value didn't count
    assert None in got and got[None] >= 1  # NULL group survives the prune


def test_sql_twin_parity(spark):
    words = [f"item{i % 700}" for i in range(2000)]
    got = kmv_distinct(
        _vals(spark, words, parts=5), "v", ["grp"], k=64
    ).collect()[0]["est_distinct"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp STRING, v STRING)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [("g", w) for w in words])
    sql = kmv_distinct_sql("v", ["grp"], "SELECT grp, v FROM t", k=64)
    want = con.execute(sql).fetchone()[1]
    assert got == want
