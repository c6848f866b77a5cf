"""Property test: the krill → Column compiler and the krill → SQL twin
agree on arbitrary predicates over mixed/loose-typed data.

SURVEY §7.3 flags loose-typing semantics ("200"==200, numeric strings,
null-vs-missing) as the easiest thing to get subtly wrong in a typed
engine — so let hypothesis hunt: random predicate trees over a table
with int, double, numeric-string, text, and nullable columns must
select the same rows in Spark and DuckDB."""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dragnet_spark.krill import compile_predicate, compile_predicate_sql

ROWS = [
    # i int, d double, ns numeric-string, s text, n nullable-string
    (0, 1.5, "200", "GET", "x"),
    (7, -2.0, "0200", "PUT", None),
    (200, 0.0, "3.5", "DELETE", "y"),
    (-3, 200.0, "abc", "", None),
    (42, 7.25, "-7", "get", "200"),
    (1000000, 1e-9, "1e3", "HEAD", "z"),
    (0, -0.0, "", "GET", None),
]
COLS = ["i", "d", "ns", "s", "n"]

_FIELDS = st.sampled_from(COLS)
_CONSTS = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.sampled_from([0.0, 1.5, 200.0, -7.0, 3.5]),
    st.sampled_from(["200", "0200", "GET", "PUT", "abc", "", "3.5", "x", "1e3"]),
    st.booleans(),
    st.none(),
)
_OPS = st.sampled_from(["eq", "ne", "lt", "le", "gt", "ge"])

_leaf = st.builds(lambda op, f, c: {op: [f, c]}, _OPS, _FIELDS, _CONSTS)


def _predicates(depth: int):
    if depth == 0:
        return _leaf
    sub = _predicates(depth - 1)
    return st.one_of(
        _leaf,
        st.builds(lambda xs: {"and": xs}, st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda xs: {"or": xs}, st.lists(sub, min_size=1, max_size=3)),
    )


@pytest.fixture(scope="module")
def arena(spark):
    pdf = pd.DataFrame(ROWS, columns=COLS)
    sdf = spark.createDataFrame(
        pdf.astype(object).where(pd.notnull(pdf), None),
        schema="i long, d double, ns string, s string, n string",
    ).cache()
    sdf.count()
    con = duckdb.connect()
    con.register("pdf", pdf)
    con.execute(
        "CREATE TABLE t AS SELECT CAST(i AS BIGINT) i, CAST(d AS DOUBLE) d, "
        "CAST(ns AS VARCHAR) ns, CAST(s AS VARCHAR) s, CAST(n AS VARCHAR) n FROM pdf"
    )
    return sdf, con


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pred=_predicates(2))
def test_spark_and_sql_twins_agree(arena, pred):
    sdf, con = arena
    got = sdf.filter(compile_predicate(pred)).count()
    sql = compile_predicate_sql(pred)
    want = con.execute(f"SELECT count(*) FROM t WHERE {sql}").fetchone()[0]
    assert got == want, f"predicate {pred!r}: spark={got} duckdb={want}"
