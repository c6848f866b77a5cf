"""Bucketizer expressions: DTrace-style quantize / lquantize.

The reference's only two numeric groupings (created at
lib/dragnet.js:61-71, semantics documented README.md:182-226):

* ``quantize``  — power-of-two buckets; a value v lands in
  [2^(k-1), 2^k) and the group key is the bucket *minimum*
  (0, 1, 2, 4, 8, ...). Values <= 0 land in bucket 0.
* ``lquantize(step)`` — linear buckets; group key is
  floor(v / step) * step.

Both accept numeric strings (the reference's test data generates
``latency`` as a string yet quantizes it, tools/mktestdata:86-90), so
inputs go through ``try_cast(double)`` first; non-numeric values become
NULL and fall out of the group-by as the null group.

These are pure built-in expressions — no UDFs — so they stay inside
whole-stage codegen and remain pushdown/partial-agg friendly at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column | str) -> Column:
    """Power-of-two bucket minimum as a long."""
    c = F.col(col) if isinstance(col, str) else col
    v = c.try_cast("double")
    return (
        F.when(v.isNull(), F.lit(None).cast("long"))
        .when(v < 1, F.lit(0).cast("long"))
        .otherwise(F.pow(F.lit(2.0), F.floor(F.log2(v))).cast("long"))
    )


def lquantize(col: Column | str, step: int) -> Column:
    """Linear bucket minimum (floor(v/step)*step) as a long."""
    if step <= 0:
        raise ValueError(f"lquantize step must be positive, got {step}")
    c = F.col(col) if isinstance(col, str) else col
    v = c.try_cast("double")
    return (F.floor(v / F.lit(float(step))) * F.lit(step)).cast("long")


def quantize_sql(expr: str) -> str:
    """ANSI-SQL twin of :func:`quantize` (for the DuckDB oracle)."""
    v = f"TRY_CAST({expr} AS DOUBLE)"
    return (
        f"CASE WHEN {v} IS NULL THEN NULL "
        f"WHEN {v} < 1 THEN 0 "
        f"ELSE CAST(POWER(2.0, FLOOR(LOG2({v}))) AS BIGINT) END"
    )


def lquantize_sql(expr: str, step: int) -> str:
    """ANSI-SQL twin of :func:`lquantize`."""
    v = f"TRY_CAST({expr} AS DOUBLE)"
    return f"CAST(FLOOR({v} / {float(step)!r}) * {step} AS BIGINT)"
