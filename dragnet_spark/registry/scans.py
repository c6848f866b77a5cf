"""Registry family module (split from registry.py; see _base)."""
from __future__ import annotations

from dragnet_spark.registry._base import DataFrame, F, QueryConfig, SparkSession, _t, register, scan, scan_oracle_sql  # noqa: F401

# ---------------------------------------------------------------------------
# Dragnet scan family (reference: dn scan; SURVEY §2.1-2.4 S1..A4)
# Oracle SQL is generated from the same QueryConfig by scan_oracle_sql,
# so Spark plan and oracle can't drift.
# ---------------------------------------------------------------------------

_EVENTS_FIELD_SQL = {"ts": "epoch(ts)"}


def _scan_pair(name: str, query: QueryConfig, doc: str, filter_ds=None):
    sql = scan_oracle_sql(
        query, "events", field_sql=_EVENTS_FIELD_SQL, datasource_filter=filter_ds
    )

    @register(name, sql, doc)
    def _q(spark: SparkSession, sf_dir: str, _query=query, _ds=filter_ds) -> DataFrame:
        return scan(_t(spark, sf_dir, "events"), _query, datasource_filter=_ds)

    return _q


_scan_pair(
    "scan_count",
    QueryConfig.load(),
    "zero-breakdown total count (reference A2, tst.empty.sh)",
)
_scan_pair(
    "scan_by_type",
    QueryConfig.load("event_type"),
    "single breakdown group-by (reference A1)",
)
_scan_pair(
    "scan_multi_breakdown",
    QueryConfig.load("event_type,uid_bucket[field=user_id,aggr=lquantize,step=100]"),
    "multi-field breakdown with linear bucketization (A1+A4)",
)
_scan_pair(
    "scan_filter_eq",
    QueryConfig.load("event_type", filter={"eq": ["event_type", "click"]}),
    "krill eq filter + breakdown (F1)",
)
_scan_pair(
    "scan_filter_loose_eq",
    QueryConfig.load("event_type", filter={"eq": ["user_id", "42"]}),
    'loose equality: string "42" matches int64 42 (F1 loose typing)',
)
_scan_pair(
    "scan_filter_and_or",
    QueryConfig.load(
        "event_type",
        filter={
            "and": [
                {"or": [{"eq": ["event_type", "click"]}, {"eq": ["event_type", "view"]}]},
                {"ge": ["value", 10]},
                {"lt": ["value", 90]},
            ]
        },
    ),
    "nested and/or combinators with relational ops (F1)",
)
_scan_pair(
    "scan_quantize",
    QueryConfig.load("val[field=value,aggr=quantize]"),
    "DTrace power-of-two histogram buckets (A3)",
)
_scan_pair(
    "scan_lquantize",
    QueryConfig.load("val[field=value,aggr=lquantize,step=25]"),
    "linear histogram buckets (A4)",
)
_scan_pair(
    "scan_day_window",
    QueryConfig.load("day[date,field=ts,aggr=lquantize,step=86400]"),
    "synthetic date + per-day tumbling window (P2+P4, README.md:322-346)",
)
_scan_pair(
    "scan_time_bounds",
    QueryConfig.load(
        "event_type",
        time_after="2024-01-10T00:00:00Z",
        time_before="2024-01-20T00:00:00Z",
        time_field="ts",
    ),
    "--after/--before event-time range filter (F3)",
)
_scan_pair(
    "scan_datasource_filter",
    QueryConfig.load("event_type"),
    "implicit datasource filter ANDed into the scan (F2)",
    filter_ds={"ne": ["event_type", "error"]},
)


@register(
    "scan_json_prop",
    scan_oracle_sql(
        QueryConfig.load("k[aggr=lquantize,step=10]"),
        "events",
        field_sql={"k": "json_extract_string(props, '$.k')"},
    ),
    "breakdown on a JSON-string property (reference nested-field pluck P1)",
)
def scan_json_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k")
    )
    return scan(df, QueryConfig.load("k[aggr=lquantize,step=10]"))


@register(
    "scan_weighted_reagg",
    scan_oracle_sql(
        QueryConfig.load("event_type"), "events", field_sql=_EVENTS_FIELD_SQL
    ),
    "skinner-point closure: re-aggregate pre-aggregated points (A5/A6, "
    "tst.format_skinner.sh) — must equal the direct scan",
)
def scan_weighted_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stage 1: partial aggregate by (event_type, day) — the "--points" output
    q1 = QueryConfig.load("event_type,day[date,field=ts,aggr=lquantize,step=86400]")
    points = scan(_t(spark, sf_dir, "events"), q1)
    # stage 2: re-scan the points as weighted records (json-skinner input)
    return scan(points, QueryConfig.load("event_type"), value_col="value")


