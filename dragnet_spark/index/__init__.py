from dragnet_spark.index.build import Metric, build_index, compact_index
from dragnet_spark.index.query import NoMetricError, find_metric, query_index

__all__ = ["Metric", "NoMetricError", "build_index", "compact_index",
           "find_metric", "query_index"]
