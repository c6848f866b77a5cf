"""DuckDB-oracle SQL generation for scan queries.

For every dragnet-style scan the engine runs via the DataFrame API,
this module emits the equivalent ANSI SQL from the *same*
:class:`~dragnet_spark.query.QueryConfig` — so the Spark plan and the
DuckDB oracle can never drift apart structurally. Semantics mirror
dragnet_spark.scan exactly: krill loose comparisons, missing/null
handling, synthetic date flooring, quantize/lquantize bucketing,
[after, before) time bounds.

Field paths that need a SQL rewrite (e.g. a timestamp column needs
``epoch(ts)``, a JSON-string property needs ``json_extract_string``)
are supplied via ``field_sql``.
"""

from __future__ import annotations

from dragnet_spark.buckets import lquantize_sql, quantize_sql
from dragnet_spark.fieldspec import Breakdown
from dragnet_spark.krill import compile_predicate_sql
from dragnet_spark.query import QueryConfig

VALUE_COL = "value"


def _date_sql(fs: str) -> str:
    """SQL twin of scan.synthetic_date_column: numeric → floored seconds,
    else ISO-8601 parse. The ±9.2e18 guard mirrors scan._EPOCH_BOUND:
    beyond int64, Spark's FLOOR clamps and DuckDB's BIGINT cast raises —
    both sides emit NULL (dropped) instead; NaN/Inf fail BETWEEN the
    same way."""
    num = f"TRY_CAST({fs} AS DOUBLE)"
    # TRIM matches Spark try_to_timestamp (and JS Date.parse), which
    # tolerate surrounding whitespace; DuckDB's TIMESTAMP cast doesn't.
    return (
        f"CASE WHEN {num} BETWEEN -9.2e18 AND 9.2e18 "
        f"THEN CAST(FLOOR({num}) AS BIGINT) "
        f"ELSE CAST(FLOOR(epoch(TRY_CAST(TRIM(CAST({fs} AS STRING)) AS TIMESTAMP))) AS BIGINT) END"
    )


def _key_sql(b: Breakdown, fs: str, exists: bool) -> str:
    if not exists and not b.date:
        return "'undefined'"
    expr = _date_sql(fs) if b.date else fs
    if b.aggr == "quantize":
        return quantize_sql(expr)
    if b.aggr == "lquantize":
        return lquantize_sql(expr, b.step or 1)
    if b.date:
        return expr
    return f"COALESCE(CAST({fs} AS STRING), 'null')"


def scan_oracle_sql(
    query: QueryConfig,
    table: str,
    field_sql: dict[str, str] | None = None,
    datasource_filter=None,
    columns: set[str] | None = None,
    value_col: str | None = None,
) -> str:
    """ANSI-SQL equivalent of ``scan(df, query, ...)`` for DuckDB.

    ``columns`` is the physical schema's top-level field set; when
    given, breakdowns referencing absent fields become the
    ``'undefined'`` group exactly like the Spark path. ``field_sql``
    maps a krill/breakdown field path to a SQL expression.
    """
    field_sql = field_sql or {}

    def ident(path: str) -> str:
        return field_sql.get(path, path)

    def exists(path: str) -> bool:
        if path in field_sql:
            return True
        if columns is None:
            return True
        return path.split(".")[0] in columns

    where: list[str] = []
    if datasource_filter:
        where.append(compile_predicate_sql(datasource_filter, ident))
    if query.filter:
        where.append(compile_predicate_sql(query.filter, ident))
    if query.time_after is not None and query.time_field is not None:
        ts = _date_sql(ident(query.time_field))
        where.append(
            f"({ts} IS NOT NULL AND {ts} >= {query.time_after}"
            f" AND {ts} < {query.time_before})"
        )
    for b in query.synthetic_dates:
        where.append(f"{_date_sql(ident(b.field))} IS NOT NULL")
    # scan() drops rows whose bucketized non-date breakdown is
    # non-numeric/missing (reference warn+drop) — mirror it, or the
    # twin would emit a NULL-bucket group Spark never produces
    for b in query.breakdowns:
        if b.bucketized and not b.date:
            where.append(f"TRY_CAST({ident(b.field)} AS DOUBLE) IS NOT NULL")

    where_sql = (" WHERE " + " AND ".join(where)) if where else ""
    weight = f"SUM({value_col})" if value_col else "COUNT(*)"

    if not query.breakdowns:
        return (
            f"SELECT CAST(COALESCE({weight}, 0) AS BIGINT) AS {VALUE_COL} "
            f"FROM {table}{where_sql}"
        )

    keys = ", ".join(
        f"{_key_sql(b, ident(b.field), exists(b.field))} AS {b.name}"
        for b in query.breakdowns
    )
    group = ", ".join(str(i + 1) for i in range(len(query.breakdowns)))
    return (
        f"SELECT {keys}, CAST({weight} AS BIGINT) AS {VALUE_COL} "
        f"FROM {table}{where_sql} GROUP BY {group}"
    )
