"""QueryConfig: the normalized query IR.

Mirrors the reference's QueryConfig produced by queryLoad
(lib/dragnet.js:28-77,103-144): a validated filter, normalized
breakdowns, optional [after, before) time bounds, and the derived set
of synthetic date fields. This is the single IR shared by the scan
path, the build path (per-metric materialization), the query path
(view routing), and the streaming variant — they differ only in
source/sink wiring.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datetime import datetime, timezone
from typing import Any

from dragnet_spark.fieldspec import Breakdown, parse_breakdowns
from dragnet_spark.krill import validate_predicate


class QueryError(ValueError):
    """Invalid query specification."""


def _to_epoch_seconds(v: Any) -> int:
    """Accept datetime, ISO-8601 string, or epoch seconds."""
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp())
    if isinstance(v, (int, float)):
        return int(v)
    if isinstance(v, str):
        s = v.replace("Z", "+00:00")
        dt = datetime.fromisoformat(s)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    raise QueryError(f"unsupported time bound: {v!r}")


@dataclass(frozen=True)
class QueryConfig:
    """A normalized filter → breakdown → weighted-count query."""

    breakdowns: tuple[Breakdown, ...] = ()
    filter: Any = None
    time_after: int | None = None   # inclusive, epoch seconds
    time_before: int | None = None  # exclusive, epoch seconds
    time_field: str | None = None   # raw field carrying the event time

    @property
    def synthetic_dates(self) -> tuple[Breakdown, ...]:
        """Breakdowns that require date parsing (reference qc_synthetic)."""
        return tuple(b for b in self.breakdowns if b.date)

    @staticmethod
    def load(
        breakdowns: str | list | None = None,
        filter: Any = None,                     # noqa: A002 - reference name
        time_after: Any = None,
        time_before: Any = None,
        time_field: str | None = None,
        allow_reserved: bool = False,
    ) -> "QueryConfig":
        """Validate and normalize (reference: queryLoad, lib/dragnet.js:103-144).

        Time bounds are both-or-neither (lib/dragnet.js:151-186) and
        require a time field to apply them to.
        """
        validate_predicate(filter)
        parsed = tuple(
            parse_breakdowns(breakdowns, allow_reserved=allow_reserved)
            if breakdowns
            else ()
        )
        if (time_after is None) != (time_before is None):
            raise QueryError('"after" and "before" must be specified together')
        after = _to_epoch_seconds(time_after) if time_after is not None else None
        before = _to_epoch_seconds(time_before) if time_before is not None else None
        if after is not None and before is not None and after >= before:
            raise QueryError('"after" must precede "before"')
        if after is not None and time_field is None:
            # a date breakdown can supply the field implicitly
            dated = [b for b in parsed if b.date]
            if not dated:
                raise QueryError("time bounds require a time field or date breakdown")
            time_field = dated[0].field
        return QueryConfig(
            breakdowns=parsed,
            filter=filter if filter else None,
            time_after=after,
            time_before=before,
            time_field=time_field,
        )
