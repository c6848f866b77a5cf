"""Query registry: every implemented operator as a (Spark, oracle-SQL) pair.

This is the engine's coverage ledger. Each entry is one operator or
query family from SURVEY.md §2 (or a beyond-reference addition):
``spark(spark, sf_dir) -> DataFrame`` runs the idiomatic-Spark
implementation; ``oracle`` is the equivalent ANSI SQL DuckDB runs over
the same parquet for a row-count/schema/value-hash cross-check.

Rules that keep the two sides hash-identical:

* every computed column is aliased the same on both sides;
* money math goes through DECIMAL(18,4)/(18,6) on both sides (exact,
  order-independent) and is cast to DOUBLE only at the end — a plain
  double SUM would differ between Spark's and DuckDB's addition
  orders;
* timestamps are output as DATE or epoch-second BIGINT, never raw
  timestamps (collect()-side timezone conversion differs);
* top-k queries carry a unique tie-breaker column in the ORDER BY.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dragnet_spark.oracle import scan_oracle_sql
from dragnet_spark.query import QueryConfig
from dragnet_spark.scan import scan
from dragnet_spark.sources.tables import load_table


@dataclass
class Entry:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""


REGISTRY: dict[str, Entry] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Entry(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec4(c: str):
    return F.col(c).cast("decimal(18,4)")


