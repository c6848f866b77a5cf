import pytest

from dragnet_spark.krill import (
    KrillError,
    compile_predicate,
    compile_predicate_sql,
    parse_filter,
    predicate_fields,
    validate_predicate,
)


def test_validate_ok():
    validate_predicate(None)
    validate_predicate({})
    validate_predicate({"eq": ["a", 1]})
    validate_predicate({"and": [{"eq": ["a", 1]}, {"lt": ["b", "2"]}]})
    validate_predicate({"or": [{"ne": ["a", None]}]})


@pytest.mark.parametrize(
    "bad",
    [
        {"eq": ["a"]},
        {"eq": ["a", 1, 2]},
        {"eq": [1, 2]},
        {"eq": ["a", {"x": 1}]},
        {"between": ["a", 1]},
        {"and": []},
        {"and": {"eq": ["a", 1]}},
        {"eq": ["a", 1], "ne": ["b", 2]},
        "notadict",
    ],
)
def test_validate_bad(bad):
    with pytest.raises(KrillError):
        validate_predicate(bad)


def test_fields():
    pred = {"and": [{"eq": ["a", 1]}, {"or": [{"lt": ["b", 2]}, {"ge": ["a", 0]}]}]}
    assert predicate_fields(pred) == ["a", "b"]


def test_parse_filter():
    assert parse_filter(None) is None
    assert parse_filter('{"eq": ["a", 1]}') == {"eq": ["a", 1]}
    with pytest.raises(KrillError):
        parse_filter("{nope")


@pytest.fixture(scope="module")
def typed_df(spark):
    return spark.createDataFrame(
        [
            (1, 200, "GET", "s200"),
            (2, 404, "PUT", "abc"),
            (3, None, None, "200"),
            (4, 200, "GET", None),
        ],
        "id int, status int, method string, strval string",
    )


def _ids(df, pred):
    return sorted(r.id for r in df.filter(compile_predicate(pred)).collect())


def test_loose_eq_numeric_const(typed_df):
    assert _ids(typed_df, {"eq": ["status", 200]}) == [1, 4]


def test_loose_eq_string_const_numeric_field(typed_df):
    # "200" matches numeric 200 (reference tst.scan_file.sh:29-33)
    assert _ids(typed_df, {"eq": ["status", "200"]}) == [1, 4]


def test_loose_eq_numeric_const_string_field(typed_df):
    assert _ids(typed_df, {"eq": ["strval", 200]}) == [3]


def test_string_compare(typed_df):
    assert _ids(typed_df, {"eq": ["method", "GET"]}) == [1, 4]
    assert _ids(typed_df, {"ne": ["method", "GET"]}) == [2]


def test_null_dropped_not_matched(typed_df):
    # null/missing fields fail evaluation → dropped (never match, even ne)
    assert 3 not in _ids(typed_df, {"ne": ["status", 999]})
    assert _ids(typed_df, {"ne": ["status", 999]}) == [1, 2, 4]


def test_relational(typed_df):
    assert _ids(typed_df, {"lt": ["status", 300]}) == [1, 4]
    assert _ids(typed_df, {"ge": ["status", "300"]}) == [2]


def test_combinators(typed_df):
    pred = {"and": [{"eq": ["method", "GET"]}, {"eq": ["status", 200]}]}
    assert _ids(typed_df, pred) == [1, 4]
    pred = {"or": [{"eq": ["method", "PUT"]}, {"eq": ["strval", "200"]}]}
    assert _ids(typed_df, pred) == [2, 3]


def test_empty_filter_matches_all(typed_df):
    assert _ids(typed_df, {}) == [1, 2, 3, 4]
    assert _ids(typed_df, None) == [1, 2, 3, 4]


def test_sql_twin_matches_spark(typed_df, spark):
    """compile_predicate_sql must agree with compile_predicate row-for-row."""
    preds = [
        {"eq": ["status", "200"]},
        {"eq": ["strval", 200]},
        {"ne": ["method", "GET"]},
        {"lt": ["status", 300]},
        {"and": [{"ge": ["status", 200]}, {"or": [{"eq": ["method", "GET"]},
                                                  {"eq": ["method", "PUT"]}]}]},
    ]
    typed_df.createOrReplaceTempView("krill_t")
    for pred in preds:
        via_col = sorted(r.id for r in typed_df.filter(compile_predicate(pred)).collect())
        sql = compile_predicate_sql(pred)
        via_sql = sorted(
            r.id for r in spark.sql(f"SELECT id FROM krill_t WHERE {sql}").collect()
        )
        assert via_col == via_sql, pred
