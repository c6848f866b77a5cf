"""Registry family module (split from registry.py; see _base)."""
from __future__ import annotations

from dragnet_spark.registry._base import DataFrame, QueryConfig, SparkSession, _t, register, scan_oracle_sql  # noqa: F401
from dragnet_spark.registry.scans import _EVENTS_FIELD_SQL  # noqa: F401

# ---------------------------------------------------------------------------
# Index build + query family (reference: dn build / dn query; S9-S10,
# A6-A7, §2.8 metric routing). The oracle is the *raw-scan* SQL — the
# whole point of the index is that it answers the same query.
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict[str, str] = {}

_INDEX_METRICS_SPEC = [
    ("by_type_day", "event_type,day[date,field=ts,aggr=lquantize,step=86400]", None),
    ("by_bucket", "val[field=value,aggr=lquantize,step=25]", None),
]


def _indexed(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per sf_dir per process) the test index tree."""
    import tempfile

    from dragnet_spark.index import Metric, build_index

    if sf_dir not in _INDEX_CACHE:
        path = tempfile.mkdtemp(prefix="dragnet_index_")
        metrics = [Metric.load(n, b, f) for n, b, f in _INDEX_METRICS_SPEC]
        build_index(
            spark,
            _t(spark, sf_dir, "events"),
            metrics,
            path,
            interval="day",
            time_field="ts",
        )
        _INDEX_CACHE[sf_dir] = path
    return _INDEX_CACHE[sf_dir]


@register(
    "index_rollup_by_type",
    scan_oracle_sql(
        QueryConfig.load("event_type"), "events", field_sql=_EVENTS_FIELD_SQL
    ),
    "build a day-partitioned view, answer a coarser group-by from it "
    "(A6/A7 rollup; must equal the raw scan)",
)
def index_rollup_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dragnet_spark.index import query_index

    return query_index(spark, _indexed(spark, sf_dir), QueryConfig.load("event_type"))


@register(
    "index_time_pruned_query",
    scan_oracle_sql(
        QueryConfig.load(
            "day[date,field=ts,aggr=lquantize,step=86400]",
            time_after="2024-01-05T00:00:00Z",
            time_before="2024-01-12T00:00:00Z",
            time_field="ts",
        ),
        "events",
        field_sql=_EVENTS_FIELD_SQL,
    ),
    "index query with [after,before) bounds — partition-pruned to 7 of "
    "30 day directories (reference S5 path enumeration)",
)
def index_time_pruned_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dragnet_spark.index import query_index

    q = QueryConfig.load(
        "day[date,field=ts,aggr=lquantize,step=86400]",
        time_after="2024-01-05T00:00:00Z",
        time_before="2024-01-12T00:00:00Z",
        time_field="ts",
    )
    return query_index(spark, _indexed(spark, sf_dir), q)


