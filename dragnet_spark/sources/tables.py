"""Canonical testdata table loader.

The driver's synthetic tables (TESTDATA.md) are single parquet files.
One quirk: ``events.ts`` is written as TIMESTAMP(NANOS), which Spark's
parquet reader rejects by default (DuckDB silently truncates it to
micros). We read nanos as a long (``spark.sql.legacy.parquet
.nanosAsLong``, set in session.py) and convert to a microsecond
timestamp, so Spark and the DuckDB oracle see identical values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # runtime-settable; required even when the session wasn't built
        # by dragnet_spark.session.get_spark (e.g. the driver's own)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanosAsLong read the TIMESTAMP(NANOS) column as int64 nanos
        # integer division: double division loses integer precision past
        # 2^53 ns (~104 days), which can shift a microsecond
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    out = {}
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            out[t] = load_table(spark, sf_dir, t)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view for spark.sql."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
