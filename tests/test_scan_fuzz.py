"""Randomized scan-vs-SQL-twin equivalence fuzzer.

The fixed oracle corpus can only catch divergences someone thought
to write down. This generates seeded-random QueryConfigs over the
events table — random krill filter trees, random breakdown tuples
(plain / quantize / lquantize / date / missing fields), random
day-aligned and unaligned time bounds — and checks scan() against
scan_oracle_sql() through DuckDB row-for-row. Every seed is
deterministic, so a failure reproduces by its test id.
"""

import random

import pytest

from dragnet_spark.oracle import scan_oracle_sql
from dragnet_spark.query import QueryConfig
from dragnet_spark.scan import scan
from tests.conftest import duck_set, rows_set

EVENTS_COLUMNS = {"event_id", "ts", "user_id", "event_type", "value", "props"}
FIELD_SQL = {"ts": "epoch(ts)"}

_BREAKDOWN_POOL = [
    "event_type",
    "user_id",
    "uid[field=user_id,aggr=lquantize,step={step}]",
    "vq[field=value,aggr=quantize]",
    "vl[field=value,aggr=lquantize,step={step}]",
    "day[date,field=ts,aggr=lquantize,step=86400]",
    "hour[date,field=ts,aggr=lquantize,step=3600]",
    "tsec[date,field=ts]",
    "ghost_field",  # absent from the schema → 'undefined' group
]

_FILTER_FIELDS = [
    ("event_type", ["click", "view", "purchase", "error", "signup", "zzz"]),
    ("user_id", [0, 7, 42, 100, 999]),
    ("value", [0, 10, 25.5, 50, 90, 100]),
]


def _rand_leaf(rng: random.Random):
    field, values = rng.choice(_FILTER_FIELDS)
    op = rng.choice(["eq", "ne", "lt", "le", "gt", "ge"])
    v = rng.choice(values)
    # krill loose typing: sometimes stringify the numeric literal
    if rng.random() < 0.3 and not isinstance(v, str):
        v = str(v)
    return {op: [field, v]}


def _rand_filter(rng: random.Random, depth: int = 0):
    r = rng.random()
    if depth >= 2 or r < 0.5:
        return _rand_leaf(rng)
    comb = "and" if r < 0.75 else "or"
    return {comb: [_rand_filter(rng, depth + 1) for _ in range(rng.randint(2, 3))]}


def _rand_query(rng: random.Random) -> QueryConfig:
    n_bd = rng.randint(0, 3)
    bds = []
    seen = set()
    for spec in rng.sample(_BREAKDOWN_POOL, len(_BREAKDOWN_POOL)):
        if len(bds) == n_bd:
            break
        name = spec.split("[")[0]
        if name in seen:
            continue
        seen.add(name)
        bds.append(spec.format(step=rng.choice([7, 50, 100, 1000])))
    filt = _rand_filter(rng) if rng.random() < 0.7 else None
    kwargs = {}
    if rng.random() < 0.4:
        # [after, before) inside the data's Jan-2024 range; sometimes
        # deliberately unaligned to bucket/day boundaries
        lo = 1704067200 + rng.randint(0, 20) * 86400 + rng.choice([0, 3601, 12345])
        hi = lo + rng.randint(1, 10) * 86400 + rng.choice([0, 777])
        kwargs = {
            "time_after": lo,
            "time_before": hi,
            "time_field": "ts",
        }
    return QueryConfig.load(",".join(bds) or None, filter=filt, **kwargs)


@pytest.mark.parametrize("seed", range(40))
def test_random_scan_matches_sql_twin(tables, oracle, seed):
    rng = random.Random(seed)
    q = _rand_query(rng)
    got = rows_set(scan(tables["events"], q))
    sql = scan_oracle_sql(
        q, "events", field_sql=FIELD_SQL, columns=EVENTS_COLUMNS
    )
    want = duck_set(oracle, sql)
    assert got == want, (
        f"seed {seed}: {len(got)} spark vs {len(want)} duck rows\n"
        f"query breakdowns={[b.attrs for b in q.breakdowns]} "
        f"filter={q.filter} after={q.time_after} before={q.time_before}\n"
        f"spark-only={sorted(got - want)[:3]}\nduck-only={sorted(want - got)[:3]}"
    )
