"""Index build: materialize pre-aggregated, time-partitioned views.

The reference's ``dn build`` (lib/dragnet.js:330-395,
lib/datasource-file.js:307-433) scans raw data once and writes one
SQLite file per time interval, each holding one table per metric
(lib/index-sink.js:121-163), with hand-built fan-out/multiplex/barrier
plumbing. Here each metric is one DataFrame plan:

    raw.filter(metric.filter)
       .groupBy(bucket, *breakdowns).sum(1)
       .write.partitionBy(bucket).parquet(index_path/metric)

Spark's partitioned-parquet layout replaces the reference's
one-SQLite-per-interval multiplexing (S9/S10) — and gives the query
path automatic partition pruning, which the reference implements by
hand with a filename-pattern enumerator (S5, lib/path-enum.js).

Scale notes: the per-bucket repartition bounds output files to one
per interval per metric (small-file protection at thousands of
buckets); the groupBy does map-side partial aggregation so the
shuffle carries unique tuples, not raw rows.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dragnet_spark.fieldspec import Breakdown, parse_breakdowns
from dragnet_spark.index.lease import hold_lease
from dragnet_spark.krill import validate_predicate
from dragnet_spark.query import QueryConfig
from dragnet_spark.scan import VALUE_COL, scan, synthetic_date_column

INDEX_META_FILE = "_dragnet_index.json"
INDEX_VERSION = "2.0.0"  # tracks the reference's dragnet_config version
BUCKET_COL = "__dn_bucket"

_INTERVAL_SECONDS = {"hour": 3600, "day": 86400}


@dataclass(frozen=True)
class Metric:
    """A materialized-view definition (reference config 'metric',
    lib/config-common.js:27-108)."""

    name: str
    breakdowns: tuple[Breakdown, ...]
    filter: Any = None

    @staticmethod
    def load(name: str, breakdowns: str | list, filter: Any = None) -> "Metric":
        validate_predicate(filter)
        return Metric(
            name=name,
            breakdowns=tuple(parse_breakdowns(breakdowns)),
            filter=filter if filter else None,
        )

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "filter": self.filter,
            "breakdowns": [
                {"name": b.name, **b.attrs} for b in self.breakdowns
            ],
        }

    @staticmethod
    def from_json(obj: dict) -> "Metric":
        return Metric.load(
            obj["name"], [dict(b) for b in obj["breakdowns"]], obj.get("filter")
        )


def bucket_column(time_src, interval: str, dtype=None):
    """Partition key for an interval: day → 'YYYY-MM-DD', hour →
    'YYYY-MM-DDTHH' (mirrors the reference's by_day/by_hour file names,
    lib/dragnet-impl.js:194-236). ``time_src`` is a column name or the
    Column carrying the raw time value; ``dtype`` is its schema type
    when known (see scan.synthetic_date_column)."""
    if isinstance(time_src, str):
        time_src = F.col(time_src)
    secs = synthetic_date_column(time_src, dtype)
    ts = F.timestamp_seconds(secs)
    fmt = "yyyy-MM-dd" if interval == "day" else "yyyy-MM-dd'T'HH"
    return F.date_format(ts, fmt)


def fanout_aggregate(src, per_metric, resolver) -> DataFrame:
    """One-pass multiplexed aggregation (the reference's S10 fan-out,
    lib/dragnet.js:330-395): every row emits one (metric_id,
    key-tuple) record per metric whose filter matches — each metric's
    krill filter and scan()'s drop+warn validity (unparseable dates,
    non-numeric bucketized values) folded into its branch condition —
    so N metrics cost ONE read of the raw data and ONE shuffle, not N
    of each. Keys ride as array<string>; :func:`select_metric`
    restores each metric's typed columns from the (small) aggregate.

    ``per_metric``: list of (krill_filter_or_None, breakdown-tuple).
    Returns a DataFrame (__m int, __k array<string>, value long).
    """
    from dragnet_spark.krill import compile_predicate
    from dragnet_spark.scan import VALUE_COL, breakdown_column

    # each distinct breakdown expression is computed ONCE into a named
    # projection; branches reference the name from both the null guard
    # and the key array. Inlining the expression at every use (the
    # previous shape) doubled per-breakdown codegen and re-evaluated
    # shared breakdowns per metric on wide metric sets.
    uniq: dict[tuple, object] = {}
    for _flt, bds in per_metric:
        for b in bds:
            uniq.setdefault((b.name, b.field, b.date, b.aggr, b.step), b)
    names = {k: f"__dn_bc{j}" for j, k in enumerate(uniq)}
    proj = src.select(
        "*",
        *[
            breakdown_column(resolver, b).alias(names[k])
            for k, b in uniq.items()
        ],
    )

    def bc(b):
        return F.col(names[(b.name, b.field, b.date, b.aggr, b.step)])

    branches = []
    for i, (flt, bds) in enumerate(per_metric):
        cond = F.lit(True)
        if flt:
            cond = compile_predicate(flt, resolver.raw)
        for b in bds:
            # date and bucketized breakdowns both carry scan()'s
            # drop+warn guard (unparseable date / non-numeric value)
            if b.date or b.bucketized:
                cond = cond & bc(b).isNotNull()
        keys = F.array(*[bc(b).cast("string") for b in bds])
        branches.append(
            F.when(cond, F.struct(F.lit(i).alias("m"), keys.alias("k")))
        )
    fan = proj.select(
        F.explode(
            F.filter(F.array(*branches), lambda x: x.isNotNull())
        ).alias("f")
    )
    return (
        fan.groupBy(F.col("f.m").alias("__m"), F.col("f.k").alias("__k"))
        .agg(F.sum(F.lit(1)).cast("long").alias(VALUE_COL))
    )


def select_metric(agg: DataFrame, i: int, bds) -> DataFrame:
    """Project metric ``i``'s typed result out of a fanout_aggregate:
    key strings cast back to long for bucketized/date breakdowns."""
    from dragnet_spark.scan import VALUE_COL

    cols = [
        F.col("__k")[j]
        .cast("long" if (b.bucketized or b.date) else "string")
        .alias(b.name)
        for j, b in enumerate(bds)
    ]
    return agg.filter(F.col("__m") == i).select(*cols, F.col(VALUE_COL))


def build_index(
    spark: SparkSession,
    df: DataFrame,
    metrics: list[Metric],
    index_path: str,
    interval: str = "day",
    time_field: str | None = None,
    datasource_filter: Any = None,
    mode: str = "overwrite",
    resolver=None,
    time_after: int | None = None,
    time_before: int | None = None,
) -> None:
    """Materialize every metric as a partitioned parquet view.

    ``resolver`` carries the field-access strategy of the raw data
    (VariantResolver for NDJSON datasources); the injected bucket
    column shadows it via ColumnOverlayResolver.

    ``time_after``/``time_before`` (epoch seconds, [after, before))
    bound the build to a time slice — the incremental-rebuild path:
    records outside the bounds are filtered (path pruning alone can
    admit partial intervals from overlapping files), and overwrite
    mode uses *dynamic* partition overwrite, so only the buckets the
    slice touches are replaced and every other interval's data
    survives. Rebuilding one late-data day at 100 TB costs one day of
    input, not the full history.
    """
    if interval not in ("hour", "day", "all"):
        raise ValueError(f"invalid interval: {interval}")
    if interval != "all" and not time_field:
        raise ValueError("hour/day intervals require a time_field")

    from dragnet_spark.scan import ColumnOverlayResolver, SchemaResolver

    base = resolver or SchemaResolver(df)
    src = df
    if datasource_filter:
        from dragnet_spark.krill import compile_predicate

        src = src.filter(compile_predicate(datasource_filter, base.raw))
    if time_after is not None and time_field:
        secs = base.date_seconds(time_field)
        src = src.filter(
            secs.isNotNull()
            & (secs >= F.lit(time_after))
            & (secs < F.lit(time_before))
        )
    scan_resolver = base
    if interval != "all":
        src = src.withColumn(
            BUCKET_COL,
            bucket_column(
                base.raw(time_field), interval, base.dtype(time_field)
            ),
        ).filter(F.col(BUCKET_COL).isNotNull())  # drop+warn semantics (P2)
        scan_resolver = ColumnOverlayResolver(base, [BUCKET_COL])
    agg_keys = (
        [Breakdown(BUCKET_COL, BUCKET_COL)] if interval != "all" else []
    )

    # One-pass multiplexed build (the reference's S10 fan-out,
    # lib/dragnet.js:330-395): every metric whose filter matches a row
    # emits one (metric_id, key-tuple) record, so N metrics cost ONE
    # read of the raw data and ONE shuffle — not N of each. At 100 TB
    # the N× raw re-read is the difference between a nightly build
    # fitting its window and not. Falls back to per-metric scans only
    # for the zero-group total shape (whose empty-input semantics —
    # one 0 row — a group-by can't produce).
    fanout = [
        m for m in metrics if (tuple(agg_keys) + m.breakdowns)
    ]
    looped = [m for m in metrics if not (tuple(agg_keys) + m.breakdowns)]

    def _write(out: DataFrame, m: Metric) -> None:
        path = os.path.join(index_path, m.name)
        # cluster rows by the leading breakdowns inside each output
        # file: sorted runs dictionary/RLE-encode tighter AND give each
        # parquet row group disjoint min/max stats, so a query-path
        # filter on a breakdown (krill → pushed predicate) skips whole
        # row groups at 100 TB instead of decoding them. Sort cost is
        # per-partition on the already-small aggregate — no extra
        # shuffle (sortWithinPartitions, not orderBy).
        # breakdown names may contain dots (req.caller): backtick-quote
        # so the sort resolves the literal column, not a struct path
        sort_cols = [F.col(f"`{b.name}`") for b in m.breakdowns]
        if interval != "all":
            # one output file per bucket partition; without this every
            # shuffle task writes a sliver into every bucket dir
            (
                out.repartition(BUCKET_COL)
                .sortWithinPartitions(F.col(BUCKET_COL), *sort_cols)
                .write.mode(mode)
                # dynamic: an overwrite replaces only the buckets this
                # build wrote, so bounded rebuilds keep other intervals
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(BUCKET_COL)
                .parquet(path)
            )
        else:
            sorted_out = (
                out.coalesce(1).sortWithinPartitions(*sort_cols)
                if m.breakdowns
                else out.coalesce(1)
            )
            sorted_out.write.mode(mode).parquet(path)

    if fanout:
        per_metric_bds = [
            (m, tuple(agg_keys) + m.breakdowns) for m in fanout
        ]
        agg = fanout_aggregate(
            src, [(m.filter, bds) for m, bds in per_metric_bds], scan_resolver
        )
        # the aggregate is small (unique tuples); cache it so the
        # per-metric writes don't re-run the scan+shuffle N times
        agg = agg.persist()
        try:
            for i, (m, bds) in enumerate(per_metric_bds):
                _write(select_metric(agg, i, bds), m)
        finally:
            agg.unpersist()

    for m in looped:
        q_with_bucket = QueryConfig(
            breakdowns=tuple(agg_keys) + m.breakdowns, filter=m.filter
        )
        _write(scan(src, q_with_bucket, resolver=scan_resolver), m)

    meta = {
        "version": INDEX_VERSION,
        "interval": interval,
        "time_field": time_field,
        "datasource_filter": datasource_filter,
        "metrics": [m.to_json() for m in metrics],
    }
    os.makedirs(index_path, exist_ok=True)
    with open(os.path.join(index_path, INDEX_META_FILE), "w") as f:
        json.dump(meta, f, indent=2)


def compact_index(
    spark: SparkSession,
    index_path: str,
    wait_s: float | None = None,
) -> None:
    """Compact a view tree that accumulated appended partial aggregates
    (the continuous-build path): re-aggregate each metric's rows to one
    row per group and rewrite, bucket partition by bucket partition.

    Correctness rests on the weighted-count closure — the query path
    re-aggregates anyway, so compaction changes row counts, never
    answers. The rewrite uses dynamic partition overwrite computed from
    a staged aggregate (never read-and-overwrite the same files in one
    job), and per-bucket output stays one file. At scale this is the
    periodic maintenance job that keeps a streaming view's file count
    and query-side merge work bounded.

    Writer concurrency is enforced by the store lease (lease.py): a
    continuous build's micro-batch append and this job serialize, so
    rows can no longer land between the snapshot read and a bucket's
    overwrite and be silently replaced by the stale aggregate. A
    late-comer waits its turn or fails loudly (LeaseHeldError).

    Staging lives beside the view (``<metric>.compact_tmp``), so it is
    on the same filesystem as the index (works on shared storage) and
    is removed afterwards.
    """
    import shutil

    from dragnet_spark.index.query import load_index_meta

    meta = load_index_meta(index_path)
    interval = meta.get("interval", "day")
    with hold_lease(index_path, "compact-index", wait_s=wait_s):
        _compact_index_locked(spark, index_path, meta, interval)


def _compact_index_locked(spark, index_path, meta, interval):
    import shutil

    from dragnet_spark.index.lease import ensure_lease

    for m in (Metric.from_json(j) for j in meta["metrics"]):
        ensure_lease(index_path)  # stolen-lease check (lease.py)
        path = os.path.join(index_path, m.name)
        df = spark.read.parquet(path)
        group_cols = [c for c in df.columns if c != "value"]
        compacted = df.groupBy(*group_cols).agg(
            F.sum("value").cast("long").alias("value")
        )
        # stage first: Spark cannot overwrite the parquet tree it is
        # currently reading
        stage = path + ".compact_tmp"
        try:
            if interval != "all" and BUCKET_COL in df.columns:
                # keep the build path's row clustering (row-group
                # stats pruning + RLE) through compaction; names may
                # contain dots → backtick-quote for literal resolution
                sort_cols = [
                    F.col(f"`{c}`") for c in group_cols if c != BUCKET_COL
                ]
                compacted.repartition(BUCKET_COL).sortWithinPartitions(
                    F.col(BUCKET_COL), *sort_cols
                ).write.mode("overwrite").partitionBy(BUCKET_COL).parquet(stage)
                (
                    spark.read.parquet(stage)
                    .repartition(BUCKET_COL)
                    .sortWithinPartitions(F.col(BUCKET_COL), *sort_cols)
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy(BUCKET_COL)
                    .parquet(path)
                )
            else:
                compacted.coalesce(1).write.mode("overwrite").parquet(stage)
                spark.read.parquet(stage).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(path)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
