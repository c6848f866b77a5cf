import pytest

from dragnet_spark.fieldspec import (
    Breakdown,
    FieldSpecError,
    parse_breakdown,
    parse_breakdowns,
)


def test_single_plain():
    assert parse_breakdowns("operation") == [Breakdown("operation", "operation")]


def test_multiple_plain():
    got = parse_breakdowns("operation,req.method,host")
    assert [b.name for b in got] == ["operation", "req.method", "host"]
    assert got[1].field == "req.method"


def test_attrs_with_values():
    (b,) = parse_breakdowns("latency[aggr=lquantize,step=100]")
    assert b.aggr == "lquantize" and b.step == 100 and b.field == "latency"


def test_bare_attr_empty_value():
    (b,) = parse_breakdowns("ts[date,field=time]")
    assert b.date is True and b.field == "time" and b.name == "ts"


def test_field_defaults_to_name():
    (b,) = parse_breakdowns("latency[aggr=quantize]")
    assert b.field == "latency" and b.aggr == "quantize" and b.step is None


def test_mixed_fields_and_attrs():
    got = parse_breakdowns("a[x=1,y],b,c[z]")
    assert [b.name for b in got] == ["a", "b", "c"]
    assert got[0].attrs == {"x": "1", "y": ""}
    assert got[2].attrs == {"z": ""}


def test_unterminated_bracket():
    with pytest.raises(FieldSpecError):
        parse_breakdowns("a[x=1")


def test_missing_field_name():
    with pytest.raises(FieldSpecError):
        parse_breakdowns("[x=1]")


def test_missing_attr_name():
    with pytest.raises(FieldSpecError):
        parse_breakdowns("a[=1]")


def test_bad_aggr():
    with pytest.raises(FieldSpecError):
        parse_breakdowns("a[aggr=sum]")


def test_lquantize_requires_step():
    with pytest.raises(FieldSpecError):
        parse_breakdowns("a[aggr=lquantize]")
    with pytest.raises(FieldSpecError):
        parse_breakdowns("a[aggr=lquantize,step=abc]")


def test_reserved_names():
    with pytest.raises(FieldSpecError):
        parse_breakdowns("__dn_ts")
    (b,) = parse_breakdowns("__dn_ts[aggr=lquantize,step=3600]", allow_reserved=True)
    assert b.step == 3600


def test_parse_one():
    b = parse_breakdown("host")
    assert b.name == "host"
    with pytest.raises(FieldSpecError):
        parse_breakdown("a,b")
