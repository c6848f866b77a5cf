"""One-pass table profiler: per-column nulls / distincts / ranges.

The first question against any 100 TB drop is "what's in it?" —
null rates, cardinalities, value ranges, per column. The naive form
is one scan per column (M scans of 100 TB); this operator computes
every column's statistics in ONE scan. The exact path melts each row
into one (gid, value) pair per column (the same ×(cols) row
multiplication Catalyst's multi-distinct Expand would do) and runs a
two-level aggregation: level 1 deduplicates (gid, value) with a
plain ``count`` — all-primitive buffers, so it plans as a
HashAggregate with map-side partial combine — and level 2 derives
every statistic from the deduplicated values (``n_distinct`` = rows,
``count`` = Σ cnt, ``min``/``max`` over distinct values ≡ over all
values). The retired single-``agg`` form (count_distinct + min/max
in one aggregate) planned the multiplied corpus through
SortAggregate — string min/max buffers disqualify hash aggregation —
paying two full-width sorts of (cols+1)× the scanned rows (measured
r14). Everything after the melt's aggregation touches rows bounded
by the column count and per-column cardinality, never the corpus.

Cross-engine exactness: numeric ranges are emitted as DOUBLE from
integer/double minima (bigint→double exact below 2^53 — epoch
micros ≈ 1.7e15 qualify), string ranges as strings (lexicographic,
no float-formatting divergence), and time columns go through the
sanctioned epoch-micros recipe (ops/temporal.ts_micros /
``epoch_us(CAST(x AS TIMESTAMP))``) so NTZ parquet time matches
DuckDB. No row-level values ride doubles through engine-ordered
sums — counts are exact integers.

Reference parity: the reference has no profiler; this is a
beyond-reference addition in the spirit of its ``--counters``
introspection (``bin/dn`` surfaces scan counters; a profile is the
table-shaped version of "what did I just read").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dragnet_spark.ops.temporal import ts_micros

#: profile row schema, in output order
_FIELDS = (
    "col_name", "n_rows", "n_nulls", "n_distinct",
    "min_num", "max_num", "min_str", "max_str",
)


def _kind(dt: T.DataType) -> str:
    """'num' | 'time' | 'str' — how a column's range is profiled."""
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "time"
    if isinstance(dt, T.NumericType):
        return "num"
    return "str"


def _range_col(name: str, kind: str) -> Column:
    if kind == "time":
        return ts_micros(F.col(name))
    return F.col(name)


#: column count above which the profiler switches n_distinct to the
#: HLL++ sketch by default. The exact path melts every row into one
#: (gid, value) pair per column: the scan's rows are REPLICATED once
#: per column, so a 100-column exact profile turns a 100 TB scan into
#: a 100-fold 10 PB aggregation input (hash-combined map-side, but
#: still materialized per row). approx_count_distinct keeps one
#: partial-agg pass (fixed-size HLL registers per column — no row
#: multiplication), which is the only sane wide-table posture; narrow
#: tables keep the exact, oracle-gradable counts.
EXACT_DISTINCT_MAX_COLS = 32


def _exact_wide(df: DataFrame, kinds: dict[str, str]) -> DataFrame:
    """The exact-distinct profile as ONE wide row, via a manual
    two-level (gid, value) distinct instead of a single multi-
    ``count_distinct`` agg. Each row melts into one (gid, value) pair
    per column (a Generate — the same ×cols row multiplication the
    retired Expand plan paid); level 1 deduplicates (gid, value) with
    a plain count, which keeps every aggregation buffer primitive so
    Catalyst plans a HashAggregate with map-side partial combine —
    the single-agg form's string min/max buffers forced SortAggregate
    plus two full-width sorts of the multiplied corpus. Level 2 (rows
    bounded by Σ per-column cardinality, never the corpus) recovers
    the exact statistics:

    - ``n_rows``  = Σ cnt over gid 0 (every row emits one gid-0 pair)
    - ``count(c)`` = Σ cnt over non-null values of c's gid
    - ``count_distinct(c)`` = #rows with a non-null value in c's gid
    - ``min/max(c)`` over the distinct values ≡ over all values

    Value keying per column is injective, so distinct counts are
    unchanged: integral/time columns key a shared LONG slot (time via
    the sanctioned epoch-micros recipe — 1:1 with the raw value),
    float/double a DOUBLE slot (float→double widening is exact;
    grouping normalizes NaN/-0.0 exactly like count_distinct's
    rewrite does), strings and booleans a STRING slot (bool→'true'/
    'false'), and any other type (decimal, array, struct, binary)
    gets its own raw-typed slot with the same grouping semantics
    count_distinct used. Columns never share a slot within one gid,
    so cross-column collisions are impossible."""
    slot_types: dict[str, T.DataType] = {
        "vl": T.LongType(), "vd": T.DoubleType(), "vs": T.StringType(),
    }
    other_slots: dict[str, str] = {}  # dataType.simpleString -> slot
    col_slot: dict[str, tuple[str, Column]] = {}
    for f in df.schema.fields:
        n, dt = f.name, f.dataType
        if kinds[n] == "time":
            col_slot[n] = ("vl", ts_micros(F.col(n)))
        elif isinstance(dt, T.IntegralType):
            col_slot[n] = ("vl", F.col(n).cast("long"))
        elif isinstance(dt, (T.FloatType, T.DoubleType)):
            col_slot[n] = ("vd", F.col(n).cast("double"))
        elif isinstance(dt, T.StringType):
            col_slot[n] = ("vs", F.col(n))
        elif isinstance(dt, T.BooleanType):
            # ranges were already the cast-to-string form; 'false' <
            # 'true' matches boolean ordering, and the cast is 1:1
            col_slot[n] = ("vs", F.col(n).cast("string"))
        else:
            key = dt.simpleString()
            if key not in other_slots:
                other_slots[key] = f"vo{len(other_slots)}"
                slot_types[other_slots[key]] = dt
            col_slot[n] = (other_slots[key], F.col(n))
    slot_order = list(slot_types)

    melted = []
    for gid, f in enumerate(df.schema.fields):
        slot, key = col_slot[f.name]
        parts = [F.lit(gid).alias("gid")]
        for s in slot_order:
            v = key if s == slot else F.lit(None).cast(slot_types[s])
            parts.append(v.alias(s))
        melted.append(F.struct(*parts))
    kv = df.select(F.explode(F.array(*melted)).alias("e")).select("e.*")
    lvl1 = kv.groupBy("gid", *slot_order).agg(
        F.count(F.lit(1)).alias("cnt")
    )

    g, cnt = F.col("gid"), F.col("cnt")
    aggs = [
        F.coalesce(
            F.sum(F.when(g == 0, cnt)), F.lit(0).cast("long")
        ).alias("__nr")
    ]
    for gid, f in enumerate(df.schema.fields):
        n, k = f.name, kinds[f.name]
        v = F.col(col_slot[n][0])
        seen = (g == gid) & v.isNotNull()
        aggs.append(
            F.coalesce(
                F.sum(F.when(seen, cnt)), F.lit(0).cast("long")
            ).alias(f"__nn_{n}")
        )
        aggs.append(F.count(F.when(seen, F.lit(1))).alias(f"__nd_{n}"))
        if k == "none":
            continue
        mn, mx = F.min(F.when(g == gid, v)), F.max(F.when(g == gid, v))
        if k in ("num", "time"):
            aggs.append(mn.cast("double").alias(f"__mn_{n}"))
            aggs.append(mx.cast("double").alias(f"__mx_{n}"))
        else:
            aggs.append(mn.alias(f"__mn_{n}"))
            aggs.append(mx.alias(f"__mx_{n}"))
    return lvl1.agg(*aggs)


def profile_table(
    df: DataFrame,
    exact_distinct: bool | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) for every top-level column of ``df``, computed
    in one scan. Numeric and time columns fill ``*_num`` (time as
    epoch micros); string-like columns fill ``*_str``; the other pair
    is null. Nested/array/binary columns profile nulls and distincts
    (by their canonical form) with null ranges.

    ``exact_distinct``: None (default) auto-selects — exact
    count_distinct up to :data:`EXACT_DISTINCT_MAX_COLS` columns,
    approx_count_distinct (HLL++, relative error ``rsd``) beyond,
    because the exact form's Expand multiplies the scanned rows by
    the number of distinct aggregates (fine at ≤32 columns, ruinous
    at hundreds). Auto-selecting the approximate path emits a
    ``UserWarning`` so consumers of ``n_distinct`` know those values
    became estimates without having counted columns themselves. Pass
    True/False to pin a mode (pinning approx is a stated choice — no
    warning); everything else (nulls, ranges, row count) is exact in
    both modes."""
    if exact_distinct is None:
        exact_distinct = len(df.schema.fields) <= EXACT_DISTINCT_MAX_COLS
        if not exact_distinct:
            import warnings

            warnings.warn(
                f"profile_table: {len(df.schema.fields)} columns > "
                f"EXACT_DISTINCT_MAX_COLS={EXACT_DISTINCT_MAX_COLS}; "
                f"n_distinct switches to approx_count_distinct "
                f"(HLL++, rsd={rsd}) — values are estimates. Pass "
                f"exact_distinct=True to force the exact Expand plan "
                f"knowingly",
                stacklevel=2,
            )

    kinds: dict[str, str] = {}
    for f in df.schema.fields:
        n = f.name
        k = _kind(f.dataType)
        if k != "str" or isinstance(f.dataType, (T.StringType, T.BooleanType)):
            rangeable = True
        else:
            rangeable = False  # arrays/structs/binary: no total order
        kinds[n] = k if rangeable else "none"

    if exact_distinct:
        wide = _exact_wide(df, kinds)
    else:
        aggs = [F.count(F.lit(1)).alias("__nr")]
        for f in df.schema.fields:
            n, k = f.name, kinds[f.name]
            c = F.col(n)
            aggs.append(F.count(c).alias(f"__nn_{n}"))
            aggs.append(F.approx_count_distinct(c, rsd).alias(f"__nd_{n}"))
            if k == "none":
                continue
            r = _range_col(n, "time" if k == "time" else k)
            if k in ("num", "time"):
                aggs.append(F.min(r).cast("double").alias(f"__mn_{n}"))
                aggs.append(F.max(r).cast("double").alias(f"__mx_{n}"))
            else:
                aggs.append(F.min(r.cast("string")).alias(f"__mn_{n}"))
                aggs.append(F.max(r.cast("string")).alias(f"__mx_{n}"))
        wide = df.agg(*aggs)
    rows = []
    for f in df.schema.fields:
        n, k = f.name, kinds[f.name]
        num = k in ("num", "time")
        rows.append(
            F.struct(
                F.lit(n).alias("col_name"),
                F.col("__nr").alias("n_rows"),
                (F.col("__nr") - F.col(f"__nn_{n}")).alias("n_nulls"),
                F.col(f"__nd_{n}").alias("n_distinct"),
                (F.col(f"__mn_{n}") if num
                 else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__mx_{n}") if num
                 else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"__mn_{n}") if k == "str"
                 else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"__mx_{n}") if k == "str"
                 else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def profile_sql(table: str, cols: dict[str, str]) -> str:
    """DuckDB twin: one UNION ALL branch per column (the oracle may
    scan M times; the Spark side is the one-scan path). ``cols`` maps
    column name → 'num' | 'time' | 'str'."""
    branches = []
    for n, k in cols.items():
        if k == "time":
            rng = f"epoch_us(CAST({n} AS TIMESTAMP))"
        else:
            rng = n
        if k in ("num", "time"):
            mn = f"CAST(MIN({rng}) AS DOUBLE)"
            mx = f"CAST(MAX({rng}) AS DOUBLE)"
            ms = "CAST(NULL AS VARCHAR)"
            xs = "CAST(NULL AS VARCHAR)"
        else:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            ms = f"MIN(CAST({n} AS VARCHAR))"
            xs = f"MAX(CAST({n} AS VARCHAR))"
        branches.append(
            f"SELECT '{n}' AS col_name, COUNT(*) AS n_rows,"
            f" COUNT(*) - COUNT({n}) AS n_nulls,"
            f" COUNT(DISTINCT {n}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num,"
            f" {ms} AS min_str, {xs} AS max_str"
            f" FROM {table}"
        )
    return "\nUNION ALL\n".join(branches)
