"""dragnet_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
TritonDataCenter/dragnet (an event-stream scan/index/query engine,
see /root/reference) on top of Apache Spark DataFrames:

* ``scan``  — filter → breakdown (group-by) → weighted count over raw
  event data (reference: ``bin/dn scan``, lib/stream-scan.js).
* ``build`` — materialize pre-aggregated, time-partitioned Parquet
  views ("metrics"/"indexes") (reference: ``dn build``,
  lib/index-sink.js).
* ``query`` — route a query to the cheapest materialized view that can
  serve it and roll it up (reference: ``dn query``,
  lib/index-query.js).

Everything is declared with the DataFrame API so Catalyst handles
predicate pushdown, column pruning, partition pruning, partial
aggregation, and join strategy. Beyond the reference we add joins,
top-k, windowed/streaming scans, dedup, similarity search, and text
analysis operators for large-scale training-data pipelines.
"""

from dragnet_spark.fieldspec import Breakdown, parse_breakdown, parse_breakdowns
from dragnet_spark.krill import (
    KrillError,
    compile_predicate,
    compile_predicate_sql,
    validate_predicate,
    predicate_fields,
)
from dragnet_spark.config import Catalog, DatasourceConfig, MetricConfig
from dragnet_spark.errors import ContractError
from dragnet_spark.index.build import Metric, build_index
from dragnet_spark.index.query import query_index
from dragnet_spark.output.format import render
from dragnet_spark.query import QueryConfig
from dragnet_spark.scan import scan, scan_ndjson
from dragnet_spark.session import get_spark

__all__ = [
    "Breakdown",
    "Catalog",
    "ContractError",
    "DatasourceConfig",
    "KrillError",
    "Metric",
    "MetricConfig",
    "QueryConfig",
    "build_index",
    "compile_predicate",
    "compile_predicate_sql",
    "get_spark",
    "parse_breakdown",
    "parse_breakdowns",
    "predicate_fields",
    "query_index",
    "render",
    "scan",
    "scan_ndjson",
    "validate_predicate",
]

__version__ = "0.1.0"
