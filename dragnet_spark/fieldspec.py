"""Breakdown field-spec parser.

Parses the reference's comma-separated field grammar
(``name[attr1=val1,attr2]``; reference: lib/attr-parser.js:17-77 and
lib/dragnet.js:210-244) into typed :class:`Breakdown` objects.

Semantics preserved from the reference:

* ``field`` attribute defaults to ``name`` (an alias/pluck-path split).
* ``aggr`` must be ``quantize`` (power-of-two buckets) or
  ``lquantize`` (linear buckets); ``lquantize`` requires an integer
  ``step``.
* a ``date`` attribute marks a synthetic timestamp column (ISO-8601 or
  epoch value parsed to floored Unix seconds).
* names starting with ``__dn`` are reserved for internal columns.
* a bare attribute (no ``=``) carries an empty-string value.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


class FieldSpecError(ValueError):
    """Raised for malformed field specs or invalid attribute combos."""


@dataclass(frozen=True)
class Breakdown:
    """One group-by column request.

    name:   output column name.
    field:  source field path (dotted for nested), defaults to name.
    date:   True → synthetic date field (parse to unix seconds).
    aggr:   None | "quantize" | "lquantize".
    step:   linear bucket width (lquantize only).
    attrs:  raw attribute dict (for round-tripping/config storage).
    """

    name: str
    field: str
    date: bool = False
    aggr: str | None = None
    step: int | None = None
    attrs: dict = dc_field(default_factory=dict, compare=False)

    @property
    def bucketized(self) -> bool:
        return self.aggr is not None


def _split_attrs(raw: str) -> list[dict]:
    """Tokenize ``a[x=1,y],b`` into [{'name':'a','x':'1','y':''},{'name':'b'}].

    Same grammar as the reference's attrsParse (lib/attr-parser.js:17-77):
    top-level commas separate fields; ``[...]`` holds comma-separated
    ``attr`` or ``attr=value`` pairs; nested brackets are not supported.
    """
    out: list[dict] = []
    i, n = 0, len(raw)
    while i < n:
        # read a field name up to ',' or '['
        j = i
        while j < n and raw[j] not in ",[":
            j += 1
        name = raw[i:j]
        if j >= n or raw[j] == ",":
            if name:
                out.append({"name": name})
            i = j + 1
            continue
        # attribute block
        if not name:
            raise FieldSpecError("missing field name")
        props: dict = {"name": name}
        j += 1  # past '['
        while True:
            k = j
            while k < n and raw[k] not in ",]":
                k += 1
            if k >= n:
                raise FieldSpecError("unexpected end of string")
            tok = raw[j:k]
            if tok:
                eq = tok.find("=")
                if eq == 0:
                    raise FieldSpecError("missing attribute name")
                if eq == -1:
                    props[tok] = ""
                else:
                    props[tok[:eq]] = tok[eq + 1 :]
            j = k + 1
            if raw[k] == "]":
                break
        out.append(props)
        # skip a separating comma if present
        if j < n and raw[j] == ",":
            j += 1
        i = j
    return out


def _normalize(props: dict, allow_reserved: bool = False) -> Breakdown:
    """Validate one parsed field (reference: parseField, lib/dragnet.js:210-244)."""
    name = props["name"]
    if not allow_reserved and name.startswith("__dn"):
        raise FieldSpecError(f'field names starting with "__dn" are reserved: {name}')

    aggr = props.get("aggr")
    step = None
    if aggr is not None:
        if aggr not in ("quantize", "lquantize"):
            raise FieldSpecError(f'unsupported aggr: "{aggr}"')
        if aggr == "lquantize":
            raw_step = props.get("step")
            if raw_step is None:
                raise FieldSpecError('aggr "lquantize" requires "step"')
            try:
                step = int(str(raw_step), 10)
            except ValueError:
                raise FieldSpecError(
                    f'aggr "lquantize": invalid value for "step": "{raw_step}"'
                ) from None

    return Breakdown(
        name=name,
        field=str(props.get("field", name)),
        date="date" in props,
        aggr=aggr,
        step=step,
        attrs={k: v for k, v in props.items() if k != "name"},
    )


def parse_breakdowns(spec: str | list, allow_reserved: bool = False) -> list[Breakdown]:
    """Parse a spec string (or pre-split list of strings/dicts) into Breakdowns."""
    if isinstance(spec, str):
        raw = _split_attrs(spec)
    else:
        raw = []
        for item in spec:
            if isinstance(item, str):
                raw.extend(_split_attrs(item))
            elif isinstance(item, dict):
                raw.append(dict(item))
            elif isinstance(item, Breakdown):
                return_item = item  # already parsed
                raw.append({"name": return_item.name, **return_item.attrs})
            else:
                raise FieldSpecError(f"unsupported breakdown spec: {item!r}")
    return [_normalize(p, allow_reserved=allow_reserved) for p in raw]


def parse_breakdown(spec: str, allow_reserved: bool = False) -> Breakdown:
    """Parse exactly one field spec."""
    parsed = parse_breakdowns(spec, allow_reserved=allow_reserved)
    if len(parsed) != 1:
        raise FieldSpecError(f"expected exactly one field, got {len(parsed)}: {spec!r}")
    return parsed[0]
