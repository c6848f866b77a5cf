"""Path enumerator tests — the reference's tests/lib/tst.path_enum.js
corpus ported case-for-case (labels kept)."""

import pytest

from dragnet_spark.sources.pathenum import PathEnumError, enumerate_paths

R = ["2010-01-01T00:00:00Z", "2010-01-10T00:00:00Z"]

ERROR_CASES = [
    # (label, pattern, range, message-regex)
    ("ends with %", "my_pattern%", R, r'unexpected "%" at char 11'),
    ("unsupported conversion", "my_pattern%T", R, r'unsupported conversion "%T" at char 11'),
    ("invalid start time", "my_pattern%Y", ["q", R[1]], r'"timeStart" is not a valid date'),
    ("invalid end time", "my_pattern%Y", [R[1], "q"], r'"timeEnd" is not a valid date'),
    (
        "start after end",
        "my_pattern%Y",
        ["2010-01-11T00:00:00Z", "2010-01-10T00:00:00Z"],
        r'"timeStart" may not be after "timeEnd"',
    ),
]

VALUE_CASES = [
    ("no date dependence", "my_pattern", R, ["my_pattern"]),
    ("literal %%", "my_%%pattern", R, ["my_%pattern"]),
    ("trailing %%", "my_pattern%%", R, ["my_pattern%"]),
    (
        "year-level",
        "%Y",
        ["2010-12-03T01:23:45.678Z", "2013-01-01T00:00:00.000"],
        ["2010", "2011", "2012"],
    ),
    (
        "year-level reaches into next year",
        "%Y",
        ["2010-01-01T00:00:00.000Z", "2013-01-01T00:00:00.001"],
        ["2010", "2011", "2012", "2013"],
    ),
    (
        "smallest range year-level",
        "%Y",
        ["2014-02-01T00:00:00.000Z", "2014-02-01T00:00:00.000Z"],
        ["2014"],
    ),
    (
        "smallest range spanning two years",
        "%Y",
        ["2014-12-31T23:59:59.999Z", "2015-01-01T00:00:00.001Z"],
        ["2014", "2015"],
    ),
    (
        "month-only (duplicates preserved)",
        "%m",
        ["2010-06-01T00:00:00Z", "2012-08-01T00:00:00Z"],
        # months step one at a time; strings repeat across years
        ["06", "07", "08", "09", "10", "11", "12", "01", "02", "03", "04",
         "05", "06", "07", "08", "09", "10", "11", "12", "01", "02", "03",
         "04", "05", "06", "07"],
    ),
    (
        "basic year-and-month",
        "%Y-%m",
        ["2010-06-01T00:00:00Z", "2012-08-01T00:00:00Z"],
        ["2010-06", "2010-07", "2010-08", "2010-09", "2010-10", "2010-11",
         "2010-12", "2011-01", "2011-02", "2011-03", "2011-04", "2011-05",
         "2011-06", "2011-07", "2011-08", "2011-09", "2011-10", "2011-11",
         "2011-12", "2012-01", "2012-02", "2012-03", "2012-04", "2012-05",
         "2012-06", "2012-07"],
    ),
    (
        "year-and-month starting from day 30",
        "%Y-%m",
        ["2010-10-30T00:00:00Z", "2011-05-01T00:00:00Z"],
        ["2010-10", "2010-11", "2010-12", "2011-01", "2011-02", "2011-03",
         "2011-04"],
    ),
    (
        "smallest range year-and-month",
        "%Y/%m",
        ["2014-02-01T00:00:00.000Z", "2014-02-01T00:00:00.000Z"],
        ["2014/02"],
    ),
    (
        "smallest range spanning two months",
        "%Y/%m",
        ["2014-01-31T23:59:59.999Z", "2014-02-01T00:00:00.001Z"],
        ["2014/01", "2014/02"],
    ),
    (
        "day-only",
        "%d",
        ["2010-06-12T03:05:06Z", "2010-06-18T00:00:00Z"],
        ["12", "13", "14", "15", "16", "17"],
    ),
    (
        "basic year-month-day",
        "year_%Y/month_%m/day_%d/some/other/stuff",
        ["2014-02-26", "2014-03-03"],
        ["year_2014/month_02/day_26/some/other/stuff",
         "year_2014/month_02/day_27/some/other/stuff",
         "year_2014/month_02/day_28/some/other/stuff",
         "year_2014/month_03/day_01/some/other/stuff",
         "year_2014/month_03/day_02/some/other/stuff"],
    ),
    (
        "smallest range MD",
        "%m/%d",
        ["2014-02-01T00:00:00.000Z", "2014-02-01T00:00:00.000Z"],
        ["02/01"],
    ),
    (
        "smallest range spanning two days",
        "%m/%d",
        ["2014-01-31T23:59:59.999Z", "2014-02-01T00:00:00.001Z"],
        ["01/31", "02/01"],
    ),
    (
        "hour-only",
        "%H",
        ["2010-06-12T03:05:06Z", "2010-06-12T09:00:00Z"],
        ["03", "04", "05", "06", "07", "08"],
    ),
    (
        "basic YMDH",
        "%Y/%m/%d/%H",
        ["2014-02-28T20:00:00Z", "2014-03-01T04:00:00Z"],
        ["2014/02/28/20", "2014/02/28/21", "2014/02/28/22", "2014/02/28/23",
         "2014/03/01/00", "2014/03/01/01", "2014/03/01/02", "2014/03/01/03"],
    ),
    (
        "smallest range DH",
        "%d/%H",
        ["2014-02-01T00:00:00.000Z", "2014-02-01T00:00:00.000Z"],
        ["01/00"],
    ),
    (
        "smallest range spanning two hours",
        "%d/%H",
        ["2014-01-31T23:59:59.999Z", "2014-02-01T00:00:00.001Z"],
        ["31/23", "01/00"],
    ),
]


@pytest.mark.parametrize(
    "pattern,rng,msg", [c[1:] for c in ERROR_CASES], ids=[c[0] for c in ERROR_CASES]
)
def test_errors(pattern, rng, msg):
    with pytest.raises(PathEnumError, match=msg):
        enumerate_paths(pattern, rng[0], rng[1])


@pytest.mark.parametrize(
    "pattern,rng,expect", [c[1:] for c in VALUE_CASES], ids=[c[0] for c in VALUE_CASES]
)
def test_values(pattern, rng, expect):
    assert enumerate_paths(pattern, rng[0], rng[1]) == expect


def test_epoch_seconds_accepted():
    # 2014-02-28T20:00:00Z .. 2014-03-01T04:00:00Z as epoch seconds
    got = enumerate_paths("%Y/%m/%d/%H", 1393617600, 1393646400)
    assert got[0] == "2014/02/28/20" and got[-1] == "2014/03/01/03"
    assert len(got) == 8


def test_prune_paths_filters_to_existing(tmp_path):
    from dragnet_spark.sources.pathenum import prune_paths

    (tmp_path / "2014" / "05-01").mkdir(parents=True)
    (tmp_path / "2014" / "05-03").mkdir(parents=True)
    got = prune_paths(
        str(tmp_path), "%Y/%m-%d", "2014-05-01T00:00:00Z", "2014-05-05T00:00:00Z"
    )
    assert got == [str(tmp_path / "2014" / "05-01"), str(tmp_path / "2014" / "05-03")]


def test_prune_paths_uri_root_not_silently_emptied(tmp_path):
    """A scheme'd root must not be pruned by driver-local stat (always
    False for s3://...): with no predicate every enumerated path stays;
    a filesystem-aware predicate can still prune."""
    from dragnet_spark.sources.pathenum import prune_paths

    got = prune_paths(
        "s3://bucket/logs", "/%Y/%m/%d", 1714521600, 1714694400
    )
    assert len(got) == 2 and got[0].startswith("s3://bucket/logs/2024/05/01")

    # explicit predicate wins (here: a fake remote FS with one day)
    got = prune_paths(
        "s3://bucket/logs", "/%Y/%m/%d", 1714521600, 1714694400,
        exists=lambda p: p.endswith("/2024/05/02"),
    )
    assert got == ["s3://bucket/logs/2024/05/02"]


def test_hadoop_exists_predicate(spark, tmp_path):
    """hadoop_exists answers through Spark's filesystems — correct for
    file: URIs where os.path.exists on the raw URI string is False."""
    import os

    from dragnet_spark.datasource import hadoop_exists

    d = tmp_path / "x"
    d.mkdir()
    uri = f"file://{d}"
    assert not os.path.exists(uri)  # the raw-URI stat that broke pruning
    ex = hadoop_exists(spark)
    assert ex(uri) and not ex(f"file://{d}/missing")
