"""The scan operator: filter → breakdowns → weighted count.

This is the reference's whole execution pipeline (StreamScan,
lib/stream-scan.js:40-96: krill filter → synthetic date parse →
time-bounds filter → skinner hash aggregation) re-expressed as one
declarative DataFrame plan:

    df.filter(...).withColumn(dates...).filter(bounds)
      .groupBy(breakdowns).agg(sum(value))

Catalyst then gives us what the reference hand-builds: predicate
pushdown to the scan, column pruning (only referenced fields are
read), map-side partial aggregation before the shuffle (the
reference's two-phase Manta map/reduce, lib/datasource-manta.js:36-62),
and spill instead of the reference's documented OOM on high-cardinality
group-bys (README.md:666-698).

Group-key normalization preserved from the reference: NULL group
values become the string "null"; a field absent from the schema
becomes "undefined" (tests/dn/local/tst.scan_file.sh.out:136-147).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dragnet_spark.buckets import lquantize, quantize
from dragnet_spark.fieldspec import Breakdown
from dragnet_spark.krill import compile_predicate
from dragnet_spark.query import QueryConfig

VALUE_COL = "value"


def _has_field(df: DataFrame, path: str) -> bool:
    """True if a (possibly dotted/nested) field exists in the schema."""
    parts = path.split(".")
    fields = df.schema
    for i, part in enumerate(parts):
        names = {f.name: f for f in fields.fields} if hasattr(fields, "fields") else {}
        if part not in names:
            return False
        dt = names[part].dataType
        if i < len(parts) - 1:
            if not hasattr(dt, "fields"):
                return False
            fields = dt
    return True


def synthetic_date_column(col: Column) -> Column:
    """Parse an ISO-8601 string or numeric epoch to floored unix seconds.

    Reference: lib/stream-synthetic.js:58-79 (numbers pass through
    floored; strings go through Date.parse; failures yield NULL here —
    the caller drops those rows, matching the reference's drop+warn).
    """
    num = col.try_cast("double")
    return (
        F.when(num.isNotNull(), F.floor(num).cast("long"))
        .otherwise(F.unix_timestamp(F.to_timestamp(col.cast("string"))))
    )


def breakdown_column(df: DataFrame, b: Breakdown) -> Column:
    """The group-by expression for one breakdown.

    Bucketized → long bucket minimum; date → unix seconds; plain →
    string with null→"null" / missing→"undefined" normalization.
    """
    if not _has_field(df, b.field) and not b.date:
        return F.lit("undefined")
    src = F.col(b.field)
    if b.date:
        src = synthetic_date_column(src)
        # a date breakdown may additionally bucketize (e.g. per-hour
        # windows: timestamp[date,field=time,aggr=lquantize,step=3600])
    if b.aggr == "quantize":
        return quantize(src)
    if b.aggr == "lquantize":
        return lquantize(src, b.step or 1)
    if b.date:
        return src
    return F.coalesce(src.cast("string"), F.lit("null"))


def scan(
    df: DataFrame,
    query: QueryConfig,
    datasource_filter=None,
    value_col: str | None = None,
) -> DataFrame:
    """Run a QueryConfig against a DataFrame of raw events.

    Returns breakdown columns (named per the query) plus a ``value``
    long column. ``value_col`` names a pre-existing weight column
    (the skinner-point re-aggregation path, reference
    lib/format-json.js:55-73); raw scans weigh each record 1.

    Zero breakdowns → a single total row, 0 on empty input
    (tests/dn/local/tst.empty.sh.out); with breakdowns, empty input
    yields zero rows.
    """
    out = df

    # datasource filter first, right after parse (lib/datasource-file.js:154-166)
    if datasource_filter:
        out = out.filter(compile_predicate(datasource_filter))
    if query.filter:
        out = out.filter(compile_predicate(query.filter))

    # synthetic date columns; unparseable/missing dates are dropped
    # with a warning in the reference (lib/stream-synthetic.js:48-77)
    date_needed = {b.name: b for b in query.synthetic_dates}
    if query.time_after is not None and query.time_field is not None:
        ts = synthetic_date_column(F.col(query.time_field))
        out = out.filter(
            ts.isNotNull()
            & (ts >= F.lit(query.time_after))
            & (ts < F.lit(query.time_before))
        )
    for b in date_needed.values():
        out = out.filter(synthetic_date_column(F.col(b.field)).isNotNull())

    weight = (
        F.col(value_col).cast("long") if value_col else F.lit(1).cast("long")
    )

    if not query.breakdowns:
        return out.agg(F.coalesce(F.sum(weight), F.lit(0)).cast("long").alias(VALUE_COL))

    keys = [breakdown_column(out, b).alias(b.name) for b in query.breakdowns]
    return (
        out.groupBy(*keys)
        .agg(F.sum(weight).cast("long").alias(VALUE_COL))
    )


def ordered(result: DataFrame) -> DataFrame:
    """Presentation-layer total sort: column-major, left to right
    (reference bin/dn:980-999). Numeric columns sort numerically,
    strings lexicographically — Spark's orderBy already does both."""
    cols = [c for c in result.columns if c != VALUE_COL]
    return result.orderBy(*cols) if cols else result
