"""Cross-dtype equivalence for time fields.

The reference only ever sees JSON strings and numbers
(lib/stream-synthetic.js:58-79), but a parquet lakehouse hands the
engine native timestamp columns on day one. Round 2's regression was
exactly this: every test fixture carried a castable ts, so a
TIMESTAMP_NTZ column hit an analysis-time try_cast error nothing had
ever exercised. This suite pins the contract: the same events, with
ts materialized as every reasonable physical type, must produce
byte-identical scan / time-bounds / index results.

Flavors:
    ntz     TIMESTAMP_NTZ  (what the driver's parquet reads as)
    tstz    TIMESTAMP      (tz-aware; session tz pinned UTC)
    date    DATE           (day precision — day-aligned queries only)
    iso     STRING         ("yyyy-MM-dd HH:mm:ss")
    dbl     DOUBLE         (epoch seconds with fraction)
    lng     BIGINT         (epoch seconds)
"""

import pytest
from pyspark.sql import functions as F

from dragnet_spark.index.build import Metric, build_index
from dragnet_spark.index.query import query_index
from dragnet_spark.query import QueryConfig
from dragnet_spark.scan import scan
from tests.conftest import rows_set

FLAVORS = ("ntz", "tstz", "date", "iso", "dbl", "lng")

# day-aligned so the DATE flavor (time-of-day truncated) agrees too
DAY_Q = QueryConfig.load("day[date,field=ts,aggr=lquantize,step=86400]")
BOUNDS_Q = QueryConfig.load(
    "event_type",
    time_after="2024-01-10T00:00:00Z",
    time_before="2024-01-20T00:00:00Z",
    time_field="ts",
)


def _flavored(events, flavor):
    ts = F.col("ts")  # TIMESTAMP_NTZ from the driver's parquet
    casts = {
        "ntz": ts,
        "tstz": ts.cast("timestamp"),
        "date": ts.cast("date"),
        "iso": F.date_format(ts, "yyyy-MM-dd HH:mm:ss"),
        "dbl": F.unix_timestamp(ts).cast("double"),
        "lng": F.unix_timestamp(ts).cast("long"),
    }
    return events.withColumn("ts", casts[flavor])


@pytest.fixture(scope="module")
def day_truth(tables):
    """The NTZ flavor is the blessed baseline; every other flavor must
    reproduce it exactly."""
    return {
        "day": rows_set(scan(_flavored(tables["events"], "ntz"), DAY_Q)),
        "bounds": rows_set(scan(_flavored(tables["events"], "ntz"), BOUNDS_Q)),
    }


@pytest.mark.parametrize("flavor", FLAVORS)
def test_day_window_flavor_equivalence(tables, day_truth, flavor):
    got = rows_set(scan(_flavored(tables["events"], flavor), DAY_Q))
    assert got == day_truth["day"], f"{flavor} day rollup diverged"


@pytest.mark.parametrize("flavor", [f for f in FLAVORS if f != "date"])
def test_time_bounds_flavor_equivalence(tables, day_truth, flavor):
    # DATE is excluded only because its grouped *event_type* totals
    # inside day-aligned bounds are identical anyway — included for
    # completeness below.
    got = rows_set(scan(_flavored(tables["events"], flavor), BOUNDS_Q))
    assert got == day_truth["bounds"], f"{flavor} bounded scan diverged"


def test_time_bounds_date_flavor(tables, day_truth):
    got = rows_set(scan(_flavored(tables["events"], "date"), BOUNDS_Q))
    assert got == day_truth["bounds"]


MESSY_TIME_VALUES = [
    "2024-01-15", "2024-01-15 10:30:00", "2024-01-15T10:30:00",
    "2024-01-15T10:30:00Z", "2024-01-15 10:30:00.123456", "2024-1-5",
    "1704067200", "1704067200.7", "-86400", "0", "1e9", "not a date",
    "", "2024-13-45", "  2024-01-15  ", "31/12/2024",
    "2024-01-15T10:30:00+05:00", "9999999999999999999999", "nan",
    "inf", "-inf", "1704067200.999999", "2024-01-15 25:00:00",
    "0001-01-01", "2262-04-11 23:47:16",
]


def test_synthetic_date_matches_sql_twin_on_messy_input(spark):
    """The Spark date parse and its DuckDB oracle twin must agree on
    every messy shape raw data throws at them: epoch ints/floats,
    every ISO variant, overflow (Spark FLOOR clamps, DuckDB BIGINT
    cast raises — both sides must NULL instead), NaN/Inf, garbage,
    whitespace padding."""
    import duckdb

    from dragnet_spark.oracle import _date_sql
    from dragnet_spark.scan import synthetic_date_column

    df = spark.createDataFrame([(c,) for c in MESSY_TIME_VALUES], "v string")
    got = {
        r["v"]: r["s"]
        for r in df.select(
            "v", synthetic_date_column(F.col("v")).alias("s")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c,) for c in MESSY_TIME_VALUES])
    want = dict(con.execute(f"SELECT v, {_date_sql('v')} AS s FROM t").fetchall())
    diffs = {c: (got[c], want[c]) for c in MESSY_TIME_VALUES if got[c] != want[c]}
    assert not diffs, f"spark vs oracle twin diverged: {diffs}"


def test_non_utc_session_pinned_by_load_table(spark, sf_dir, oracle):
    """A harness that builds its own SparkSession may carry a local
    timezone; load_table must pin UTC so NTZ epochs still match the
    DuckDB oracle."""
    from dragnet_spark.registry import REGISTRY
    from tests.conftest import duck_set

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        entry = REGISTRY["scan_day_window"]
        got = rows_set(entry.spark(spark, sf_dir))
        want = duck_set(oracle, entry.oracle)
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


@pytest.mark.parametrize("flavor", ["ntz", "iso", "dbl"])
def test_index_build_query_flavor_equivalence(
    spark, tables, tmp_path_factory, flavor
):
    """The index build path (bucket_column → partitioned parquet →
    query_index) over each physical ts type must agree."""
    path = str(tmp_path_factory.mktemp(f"idx_{flavor}"))
    m = Metric.load("by_type", "event_type")
    build_index(
        spark,
        _flavored(tables["events"], flavor),
        [m],
        path,
        interval="day",
        time_field="ts",
    )
    got = rows_set(
        query_index(spark, path, QueryConfig.load("event_type"))
    )
    want = rows_set(
        tables["events"]
        .groupBy(F.col("event_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("value"))
    )
    assert got == want, f"{flavor} indexed rollup diverged"
