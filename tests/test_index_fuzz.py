"""Randomized index-routing equivalence: for random metric
definitions and random queries those metrics can serve, answering
from the materialized view must equal the raw scan row-for-row.

The fixed corpus in test_equivalence covers one wide metric; this
exercises the router (§2.8) and the build/query round-trip across
many metric shapes — filtered metrics (identical-filter routing),
bucketized columns, date buckets, and day-aligned time bounds (which
are record-exact at day granularity).
"""

# multi-minute store/ladder/soak tier: deselected from the default
# gate (pytest.ini addopts) so the driver's suite run completes;
# run with `pytest -m slow` (the builder's sessions do).
pytestmark = __import__("pytest").mark.slow

import random

import pytest

from dragnet_spark.index.build import Metric, build_index
from dragnet_spark.index.query import query_index
from dragnet_spark.query import QueryConfig
from dragnet_spark.scan import scan
from tests.conftest import rows_set

# breakdown spec pool: (spec string, needs nothing else). Names are
# stable so query specs can reference a metric's columns exactly.
_SPECS = [
    "event_type",
    "uid[field=user_id,aggr=lquantize,step=100]",
    "vq[field=value,aggr=quantize]",
    "day[date,field=ts,aggr=lquantize,step=86400]",
]

_FILTERS = [
    {"eq": ["event_type", "click"]},
    {"ne": ["event_type", "error"]},
    {"or": [{"eq": ["event_type", "view"]}, {"eq": ["event_type", "signup"]}]},
]


def _day(n: int) -> int:
    return 1704067200 + n * 86400  # 2024-01-01 + n days


@pytest.mark.parametrize("seed", range(10))
def test_random_metric_roundtrip(spark, tables, tmp_path_factory, seed):
    rng = random.Random(seed)
    specs = rng.sample(_SPECS, rng.randint(1, 3))
    mfilter = rng.choice([None, None, rng.choice(_FILTERS)])
    metric = Metric.load(f"m{seed}", ",".join(specs), mfilter)

    idx = str(tmp_path_factory.mktemp(f"fuzz{seed}"))
    build_index(
        spark, tables["events"], [metric], idx, interval="day", time_field="ts"
    )

    # a query the metric can serve: subset of its breakdowns, the
    # metric's own filter (or an indexed-field filter when unfiltered),
    # day-aligned bounds only when a date column exists
    q_specs = rng.sample(specs, rng.randint(0, len(specs))) or [specs[0]]
    if mfilter is not None:
        qfilter = mfilter if rng.random() < 0.8 else None
        if qfilter is None and rng.random() < 0.5:
            pytest.skip("filtered metric can't serve unfiltered query")
    else:
        qfilter = (
            rng.choice(_FILTERS)
            if "event_type" in q_specs and rng.random() < 0.5
            else None
        )
    kwargs = {}
    if "day[date,field=ts,aggr=lquantize,step=86400]" in specs and rng.random() < 0.5:
        lo = _day(rng.randint(0, 10))
        kwargs = {
            "time_after": lo,
            "time_before": _day(rng.randint(11, 25)),
            "time_field": "ts",
        }
    q = QueryConfig.load(",".join(q_specs), filter=qfilter, **kwargs)

    if mfilter is not None and qfilter is None:
        with pytest.raises(Exception):
            query_index(spark, idx, q)
        return

    got = rows_set(query_index(spark, idx, q))
    want = rows_set(scan(tables["events"], q))
    assert got == want, (
        f"seed {seed}: index answer diverged from raw scan\n"
        f"metric={specs} mfilter={mfilter}\n"
        f"query={q_specs} qfilter={qfilter} bounds={kwargs}\n"
        f"index-only={sorted(got - want)[:3]}\nscan-only={sorted(want - got)[:3]}"
    )


# ---------------------------------------------------------------------------
# The three-way corner of find_metric's conservative subsumption
# (lib/index-query.js:178-207 → index/query.py): a FILTERED metric
# serving a TIME-BOUNDED query from an HOURLY index exercises filter
# identity, date-breakdown requirement, and interval pruning in one
# routing decision. Every one of the 2^3 on/off combinations must
# round-trip exactly against the raw scan.
# ---------------------------------------------------------------------------

import itertools


@pytest.mark.parametrize(
    "filtered,bounded,hourly", list(itertools.product([False, True], repeat=3))
)
def test_router_three_way_interactions(
    spark, tables, tmp_path_factory, filtered, bounded, hourly
):
    step = 3600 if hourly else 86400
    specs = ["event_type", f"t[date,field=ts,aggr=lquantize,step={step}]"]
    mfilter = {"eq": ["event_type", "click"]} if filtered else None
    metric = Metric.load("m3w", ",".join(specs), mfilter)

    idx = str(
        tmp_path_factory.mktemp(f"r3w_{int(filtered)}{int(bounded)}{int(hourly)}")
    )
    build_index(
        spark,
        tables["events"],
        [metric],
        idx,
        interval="hour" if hourly else "day",
        time_field="ts",
    )

    kwargs = {}
    if bounded:
        # bounds aligned to the breakdown step, so the pruned index
        # answer is record-exact vs the raw scan
        lo = _day(5) + (7 * 3600 if hourly else 0)
        hi = _day(12) + (5 * 3600 if hourly else 0)
        kwargs = {"time_after": lo, "time_before": hi, "time_field": "ts"}
    q = QueryConfig.load(",".join(specs), filter=mfilter, **kwargs)

    got = rows_set(query_index(spark, idx, q))
    want = rows_set(scan(tables["events"], q))
    assert got == want, (
        f"filtered={filtered} bounded={bounded} hourly={hourly}: "
        f"index-only={sorted(got - want)[:3]} scan-only={sorted(want - got)[:3]}"
    )


# ---------------------------------------------------------------------------
# Multi-metric catalogs under ambiguity (round-5): several metrics
# PARTIALLY cover the query; the router must pick the FIRST valid one
# in catalog order (reference first-match semantics,
# lib/index-query.js:163-166), never a "better" later one, and the
# answer must round-trip against the raw scan no matter which metric
# served it. The expected winner comes from an independent
# reimplementation of the documented routing contract, so a router
# change that silently reorders matches fails here even when the
# numbers still happen to agree.
# ---------------------------------------------------------------------------

from dragnet_spark.index.query import NoMetricError, find_metric

_DAY_SPEC = "day[date,field=ts,aggr=lquantize,step=86400]"
_CATALOG_POOL = [
    # (name, specs, filter) — deliberately overlapping coverage
    ("full", ["event_type", "uid[field=user_id,aggr=lquantize,step=100]", _DAY_SPEC], None),
    ("et_only", ["event_type"], None),
    ("et_day", ["event_type", _DAY_SPEC], None),
    ("uid_only", ["uid[field=user_id,aggr=lquantize,step=100]"], None),
    ("click_day", ["event_type", _DAY_SPEC], {"eq": ["event_type", "click"]}),
    ("click_et", ["event_type"], {"eq": ["event_type", "click"]}),
]


def _expected_first_match(catalog, q_specs, q_filter, bounded):
    """Independent twin of the routing contract: first metric whose
    (filter identity | indexed filter fields) x (date breakdown when
    bounded) x (breakdown coverage) all hold."""
    for name, specs, mfilter in catalog:
        cols = {s.split("[")[0] for s in specs}
        if mfilter is not None:
            if q_filter != mfilter:
                continue
        elif q_filter is not None:
            # filter fields must be indexed; pool filters only touch
            # event_type
            if "event_type" not in cols:
                continue
        if bounded and not any("date" in s for s in specs):
            continue
        if any(s.split("[")[0] not in cols for s in q_specs):
            continue
        # identical spec strings -> compatibility is name identity,
        # but the full spec must match too (step/aggr)
        if any(s not in specs for s in q_specs):
            continue
        return name
    return None


@pytest.mark.parametrize("seed", range(12))
def test_router_first_match_under_ambiguity(
    spark, tables, tmp_path_factory, seed
):
    rng = random.Random(1000 + seed)
    catalog = rng.sample(_CATALOG_POOL, rng.randint(3, len(_CATALOG_POOL)))
    metrics = [
        Metric.load(name, ",".join(specs), mfilter)
        for name, specs, mfilter in catalog
    ]
    idx = str(tmp_path_factory.mktemp(f"amb{seed}"))
    build_index(
        spark, tables["events"], metrics, idx, interval="day", time_field="ts"
    )

    q_specs = rng.choice(
        [
            ["event_type"],
            ["event_type", _DAY_SPEC],
            ["uid[field=user_id,aggr=lquantize,step=100]"],
            [_DAY_SPEC],
        ]
    )
    q_filter = rng.choice([None, None, {"eq": ["event_type", "click"]}])
    bounded = rng.random() < 0.5
    kwargs = (
        {"time_after": _day(3), "time_before": _day(20), "time_field": "ts"}
        if bounded
        else {}
    )
    q = QueryConfig.load(",".join(q_specs), filter=q_filter, **kwargs)

    expect = _expected_first_match(catalog, q_specs, q_filter, bounded)
    if expect is None:
        with pytest.raises(NoMetricError):
            find_metric(q, metrics)
        return
    m, ignore_filter = find_metric(q, metrics)
    assert m.name == expect, (
        f"seed {seed}: router picked {m.name}, first valid in catalog "
        f"order is {expect} (catalog={[c[0] for c in catalog]}, "
        f"q={q_specs} f={q_filter} bounded={bounded})"
    )
    assert ignore_filter == (m.filter is not None)

    got = rows_set(query_index(spark, idx, q))
    want = rows_set(scan(tables["events"], q))
    assert got == want, (
        f"seed {seed}: {m.name} served a wrong answer: "
        f"index-only={sorted(got - want)[:3]} scan-only={sorted(want - got)[:3]}"
    )
