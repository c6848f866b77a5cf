"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query as a smoke check;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus beyond-reference analytics/pipeline operators) for
the driver's DuckDB cross-check at sf=0.01.

The real implementations live in dragnet_spark.registry — this module
stays a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dragnet_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: dragnet-style filtered, time-bucketed scan over events
    at sf0.001 (the reference's core scan lifecycle, SURVEY §3.1)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return registry.REGISTRY["scan_day_window"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
