"""Krill predicate compiler: JSON predicate tree → Spark Column / SQL.

The reference filters records with node-krill JSON predicates
(reference: README.md:161-174; evaluation wrapper
lib/krill-skinner-stream.js:29-52; shape validation lib/dragnet.js:112-123):

* leaves: ``{"eq": ["field", value]}`` with ops eq/ne/lt/le/gt/ge,
* combinators: ``{"and": [p, ...]}``, ``{"or": [p, ...]}``.

Semantics preserved:

* **loose equality** — ``{"eq": ["res.statusCode", "200"]}`` matches a
  numeric 200 (JS ``==``): when the constant parses as a number, we
  compare numerically if the field value is numeric, else textually.
* **missing-field drop** — a record whose referenced field is
  missing/null fails evaluation and is dropped (not treated as false →
  still dropped, but counted separately in the reference). Columnar
  storage conflates JSON null with absent, so every leaf carries an
  ``IS NOT NULL`` conjunct on its field.

Two backends emit identical semantics: :func:`compile_predicate`
(Spark ``Column``, stays in whole-stage codegen) and
:func:`compile_predicate_sql` (ANSI SQL for the DuckDB oracle and for
pushing filters into materialized-view queries — the reference's
analog is krill's toCStyleString, lib/index-query.js:434-459).
"""

from __future__ import annotations

import json
import math
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_LEAF_OPS = {"eq", "ne", "lt", "le", "gt", "ge"}
_COMBINATORS = {"and", "or"}

_SQL_OP = {"eq": "=", "ne": "<>", "lt": "<", "le": "<=", "gt": ">", "ge": ">="}


class KrillError(ValueError):
    """Malformed krill predicate."""


def _is_numberlike(v: Any) -> bool:
    if isinstance(v, bool):
        return False
    if isinstance(v, (int, float)):
        return True
    if isinstance(v, str):
        try:
            f = float(v)
        except ValueError:
            return False
        return math.isfinite(f)
    return False


def validate_predicate(pred: Any) -> None:
    """Raise KrillError unless ``pred`` is a structurally valid predicate.

    ``{}`` / None mean "match everything" (reference accepts an empty
    filter object).
    """
    if pred is None:
        return
    if not isinstance(pred, dict):
        raise KrillError(f"predicate must be an object, got {type(pred).__name__}")
    if len(pred) == 0:
        return
    if len(pred) != 1:
        raise KrillError(f"predicate must have exactly one key, got {sorted(pred)}")
    (op, arg), = pred.items()
    if op in _COMBINATORS:
        if not isinstance(arg, list) or not arg:
            raise KrillError(f'"{op}" takes a non-empty array of predicates')
        for sub in arg:
            validate_predicate(sub)
        return
    if op in _LEAF_OPS:
        if (
            not isinstance(arg, list)
            or len(arg) != 2
            or not isinstance(arg[0], str)
            or isinstance(arg[1], (dict, list))
        ):
            raise KrillError(f'"{op}" takes [fieldname, scalar]')
        return
    raise KrillError(f"unknown predicate operator: {op!r}")


def predicate_fields(pred: Any) -> list[str]:
    """All field paths referenced by the predicate, in first-use order."""
    out: list[str] = []

    def walk(p: Any) -> None:
        if not p:
            return
        (op, arg), = p.items()
        if op in _COMBINATORS:
            for sub in arg:
                walk(sub)
        elif arg[0] not in out:
            out.append(arg[0])

    validate_predicate(pred)
    walk(pred)
    return out


def _leaf_column(
    field: str, op: str, const: Any, col_for: Callable[[str], Column]
) -> Column:
    col = col_for(field)
    if isinstance(const, bool):
        cmp = _apply_op(col.try_cast("boolean"), op, F.lit(const))
    elif isinstance(const, (int, float)):
        cmp = _apply_op(col.try_cast("double"), op, F.lit(float(const)))
    elif isinstance(const, str) and _is_numberlike(const):
        # numeric field → numeric compare (JS coerces the string);
        # non-numeric field → text compare (JS compares two strings)
        num = col.try_cast("double")
        cmp = F.when(
            num.isNotNull(), _apply_op(num, op, F.lit(float(const)))
        ).otherwise(_apply_op(col.cast("string"), op, F.lit(const)))
    elif const is None:
        # JS loose: null == null only; relational vs null is rare — treat
        # as "field is null", but the isNotNull guard drops those rows
        # anyway, matching the columnar null≡missing conflation.
        cmp = F.lit(op == "ne")
    else:
        cmp = _apply_op(col.cast("string"), op, F.lit(str(const)))
    # NO coalesce(cmp, false) around cmp: inside a filter, a NULL
    # predicate already drops the row (identically under AND/OR since
    # krill has no NOT), and the bare comparison stays pushdown-
    # eligible — Catalyst elides the no-op string cast on string
    # columns and pushes EqualTo into the parquet scan.
    return col.isNotNull() & cmp


def _apply_op(lhs: Column, op: str, rhs: Column) -> Column:
    if op == "eq":
        return lhs == rhs
    if op == "ne":
        return lhs != rhs
    if op == "lt":
        return lhs < rhs
    if op == "le":
        return lhs <= rhs
    if op == "gt":
        return lhs > rhs
    return lhs >= rhs


def compile_predicate(
    pred: Any, col_for: Callable[[str], Column] | None = None
) -> Column:
    """Compile a krill predicate to a Spark boolean Column.

    ``col_for`` maps a krill field path to the Column carrying that
    field's value (default: ``F.col`` — schema'd DataFrames; the
    variant-based NDJSON scan passes a variant-path getter). Stays
    entirely in built-in expressions (codegen-friendly, pushdown-
    eligible); never a Python UDF.
    """
    validate_predicate(pred)
    col_for = col_for or F.col
    if not pred:
        return F.lit(True)
    (op, arg), = pred.items()
    if op == "and":
        out = compile_predicate(arg[0], col_for)
        for sub in arg[1:]:
            out = out & compile_predicate(sub, col_for)
        return out
    if op == "or":
        out = compile_predicate(arg[0], col_for)
        for sub in arg[1:]:
            out = out | compile_predicate(sub, col_for)
        return out
    return _leaf_column(arg[0], op, arg[1], col_for)


def _sql_quote_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _leaf_sql(field: str, op: str, const: Any, ident: Callable[[str], str]) -> str:
    f = ident(field)
    sqlop = _SQL_OP[op]
    if isinstance(const, bool):
        # replicate Spark's boolean cast exactly: numeric types follow
        # the nonzero rule; strings use the cast vocabulary (t/true/y/
        # yes/1 and f/false/n/no/0, trimmed, case-insensitive) —
        # DuckDB's own TRY_CAST accepts neither ('y' → NULL, 2.0 → err)
        s = f"trim(lower(CAST({f} AS STRING)))"
        numeric = (
            f"typeof({f}) IN ('TINYINT','SMALLINT','INTEGER','BIGINT',"
            f"'HUGEINT','FLOAT','DOUBLE') OR typeof({f}) LIKE 'DECIMAL%'"
        )
        b = (
            f"(CASE WHEN {numeric} THEN TRY_CAST({f} AS DOUBLE) <> 0 "
            f"WHEN {s} IN ('t','true','y','yes','1') THEN TRUE "
            f"WHEN {s} IN ('f','false','n','no','0') THEN FALSE END)"
        )
        cmp = f"{b} {sqlop} {str(const).upper()}"
    elif isinstance(const, (int, float)):
        cmp = f"TRY_CAST({f} AS DOUBLE) {sqlop} {float(const)!r}"
    elif isinstance(const, str) and _is_numberlike(const):
        num = f"TRY_CAST({f} AS DOUBLE)"
        cmp = (
            f"CASE WHEN {num} IS NOT NULL THEN {num} {sqlop} {float(const)!r} "
            f"ELSE CAST({f} AS STRING) {sqlop} {_sql_quote_str(const)} END"
        )
    elif const is None:
        cmp = "TRUE" if op == "ne" else "FALSE"
    else:
        cmp = f"CAST({f} AS STRING) {sqlop} {_sql_quote_str(str(const))}"
    return f"({f} IS NOT NULL AND COALESCE({cmp}, FALSE))"


def compile_predicate_sql(pred: Any, ident: Callable[[str], str] | None = None) -> str:
    """Compile a krill predicate to an ANSI-SQL boolean expression.

    ``ident`` maps a krill field path to a SQL expression (defaults to
    the path itself — fine for flat columns). Output runs unchanged on
    DuckDB and Spark SQL, with semantics identical to
    :func:`compile_predicate`.
    """
    validate_predicate(pred)
    ident = ident or (lambda f: f)
    if not pred:
        return "TRUE"
    (op, arg), = pred.items()
    if op in _COMBINATORS:
        joiner = " AND " if op == "and" else " OR "
        return "(" + joiner.join(compile_predicate_sql(s, ident) for s in arg) + ")"
    return _leaf_sql(arg[0], op, arg[1], ident)


def parse_filter(text: str | None) -> Any:
    """Parse a filter given as JSON text (CLI form), validating it."""
    if text is None:
        return None
    try:
        pred = json.loads(text)
    except json.JSONDecodeError as e:
        raise KrillError(f"invalid filter JSON: {e}") from None
    validate_predicate(pred)
    return pred
