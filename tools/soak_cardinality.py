#!/usr/bin/env python
"""Cardinality-bomb soak: the reference's documented failure mode is
aggregation state ∝ unique output tuples — "10 fields with 10 values
each is 10^10 tuples, more than Dragnet can currently handle"; the
failure is GC thrash then OOM (reference README.md:666-698).

This drives the same engine surface (scan()'s groupBy-sum) over a
synthetic stream whose GROUP CARDINALITY equals its row count — every
row a distinct tuple, the worst case — and records wall-clock and
result size. Spark's hash aggregation spills instead of dying, so the
gate is completion + exact count, not an RSS ceiling.

Usage: python tools/soak_cardinality.py [N_UNIQUE]   (default 20,000,000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(app_name="soak_cardinality")
    # two breakdown fields whose cross product is all-distinct: the
    # aggregation's hash state must hold n entries (or spill)
    df = spark.range(n).select(
        (F.col("id") % 100_000).alias("a"),
        (F.col("id") / 100_000).cast("long").alias("b"),
        F.lit(1).alias("value"),
    )
    t0 = time.time()
    agg = df.groupBy("a", "b").agg(F.sum("value").alias("value"))
    groups = agg.count()
    dt = time.time() - t0
    total = agg.agg(F.sum("value")).first()[0]
    out = {
        "n_rows": n,
        "n_groups": groups,
        "all_distinct": groups == n,
        "total_weight": int(total),
        "sec": round(dt, 2),
        "rows_per_sec": round(n / dt),
    }
    assert groups == n and total == n
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
