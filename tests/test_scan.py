"""Scan-path tests cross-checked against a DuckDB oracle on the same parquet."""

from pyspark.sql import functions as F

from dragnet_spark.query import QueryConfig
from dragnet_spark.scan import ordered, scan

from tests.conftest import duck_set, rows_set


def test_count_everything(tables, oracle):
    q = QueryConfig.load()
    got = scan(tables["events"], q).collect()
    (want,) = oracle.execute("SELECT count(*) FROM events").fetchone()
    assert len(got) == 1 and got[0].value == want


def test_one_breakdown(tables, oracle):
    q = QueryConfig.load("event_type")
    got = rows_set(scan(tables["events"], q))
    want = duck_set(
        oracle,
        "SELECT event_type, count(*) FROM events GROUP BY 1",
    )
    assert got == want


def test_filter_and_breakdown(tables, oracle):
    q = QueryConfig.load("event_type", filter={"eq": ["event_type", "click"]})
    got = rows_set(scan(tables["events"], q))
    want = duck_set(
        oracle,
        "SELECT event_type, count(*) FROM events WHERE event_type = 'click' GROUP BY 1",
    )
    assert got == want


def test_loose_numeric_filter(tables, oracle):
    # user_id is int64; filter with a string constant still matches
    q = QueryConfig.load(filter={"eq": ["user_id", "7"]})
    got = scan(tables["events"], q).collect()[0].value
    (want,) = oracle.execute("SELECT count(*) FROM events WHERE user_id = 7").fetchone()
    assert got == want


def test_quantize_breakdown(tables, oracle):
    q = QueryConfig.load("value[aggr=quantize]")
    got = rows_set(scan(tables["events"], q))
    want = duck_set(
        oracle,
        """
        SELECT CASE WHEN value IS NULL THEN NULL
                    WHEN value < 1 THEN 0
                    ELSE CAST(POWER(2.0, FLOOR(LOG2(value))) AS BIGINT) END AS b,
               count(*)
        FROM events GROUP BY 1
        """,
    )
    assert got == want


def test_lquantize_breakdown(tables, oracle):
    q = QueryConfig.load("value[aggr=lquantize,step=25]")
    got = rows_set(scan(tables["events"], q))
    want = duck_set(
        oracle,
        "SELECT CAST(FLOOR(value/25.0)*25 AS BIGINT) AS b, count(*) FROM events GROUP BY 1",
    )
    assert got == want


def test_synthetic_date_and_time_bounds(tables, oracle):
    q = QueryConfig.load(
        "day[date,field=ts,aggr=lquantize,step=86400]",
        time_after="2024-01-05T00:00:00Z",
        time_before="2024-01-08T00:00:00Z",
    )
    got = rows_set(scan(tables["events"], q))
    want = duck_set(
        oracle,
        """
        SELECT CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS day, count(*)
        FROM events
        WHERE epoch(ts) >= epoch(TIMESTAMP '2024-01-05')
          AND epoch(ts) < epoch(TIMESTAMP '2024-01-08')
        GROUP BY 1
        """,
    )
    assert got == want


def test_missing_field_groups_as_undefined(tables):
    q = QueryConfig.load("no_such_field")
    rows = scan(tables["events"], q).collect()
    assert len(rows) == 1
    assert rows[0].no_such_field == "undefined"


def test_null_groups_as_string_null(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",)], "k string"
    )
    q = QueryConfig.load("k")
    got = rows_set(scan(df, q))
    assert got == {("a", 2), ("null", 1)}


def test_empty_input_zero_total_and_zero_groups(tables):
    empty = tables["events"].filter(F.lit(False))
    total = scan(empty, QueryConfig.load()).collect()
    assert len(total) == 1 and total[0].value == 0
    grouped = scan(empty, QueryConfig.load("event_type")).collect()
    assert grouped == []


def test_skinner_weight_reaggregation(spark):
    """Aggregated output re-scans as weighted points (reference
    json-skinner closure, tests/dn/local/tst.format_skinner.sh)."""
    df = spark.createDataFrame(
        [("a", 2), ("a", 3), ("b", 1)], "k string, value int"
    )
    q = QueryConfig.load("k")
    got = rows_set(scan(df, q, value_col="value"))
    assert got == {("a", 5), ("b", 1)}


def test_datasource_filter_composes(tables, oracle):
    q = QueryConfig.load("event_type")
    got = rows_set(
        scan(tables["events"], q, datasource_filter={"ne": ["event_type", "error"]})
    )
    want = duck_set(
        oracle,
        "SELECT event_type, count(*) FROM events WHERE event_type <> 'error' GROUP BY 1",
    )
    assert got == want


def test_ordered_sorts_column_major(tables):
    q = QueryConfig.load("event_type")
    rows = ordered(scan(tables["events"], q)).collect()
    keys = [r.event_type for r in rows]
    assert keys == sorted(keys)


def test_string_filter_pushes_into_parquet_scan(tables, capsys):
    """Krill string equality must reach the parquet reader as a pushed
    filter (scale contract: row-group skipping at 100 TB), and column
    pruning must reduce ReadSchema to the referenced column."""
    q = QueryConfig.load("event_type", filter={"eq": ["event_type", "click"]})
    scan(tables["events"], q).explain("formatted")
    plan = capsys.readouterr().out
    assert "EqualTo(event_type,click)" in plan
    assert "ReadSchema: struct<event_type:string>" in plan
