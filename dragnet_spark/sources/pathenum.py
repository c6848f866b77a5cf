"""Time-partition path enumeration for raw file trees.

The reference prunes file listings by expanding a restricted strftime
pattern (%Y %m %d %H, plus %% escapes) over [start, end) and
intersecting with the filesystem (lib/path-enum.js:27-94,175-265;
wired into scans at lib/datasource-file.js:218-246). For
Hive-partitioned data Spark does this automatically; for raw log
trees laid out as e.g. ``logs/2014/05-01/`` this driver-side helper
produces the concrete path list handed to ``spark.read``.

Exact reference semantics (verified against tests/lib/tst.path_enum.js):

* granularity = the finest conversion present (H < d < m < Y);
* the start time is floored to that granularity and the first value is
  emitted unconditionally (so start == end yields one path); then the
  cursor steps one unit at a time, stopping when it reaches ``end``;
* a pattern with no conversions emits itself exactly once;
* values are NOT deduplicated (a %m-only pattern spanning two years
  repeats month strings — lib/path-enum.js's %m test case);
* ``%%`` is a literal percent; any other conversion is an error with
  the reference's message shape (char positions are 1-based).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

_CONVERSIONS = "YmdH"  # coarse → fine


class PathEnumError(ValueError):
    pass


def _tokenize(pattern: str) -> list[tuple[str, str]]:
    """Pattern → [('str', literal) | ('conv', one of YmdH)] tokens."""
    toks: list[tuple[str, str]] = []
    buf = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch != "%":
            buf.append(ch)
            i += 1
            continue
        if i + 1 >= len(pattern):
            raise PathEnumError(f'unexpected "%" at char {i + 1}')
        c = pattern[i + 1]
        if c == "%":
            buf.append("%")
        elif c in _CONVERSIONS:
            if buf:
                toks.append(("str", "".join(buf)))
                buf = []
            toks.append(("conv", c))
        else:
            raise PathEnumError(f'unsupported conversion "%{c}" at char {i + 1}')
        i += 2
    if buf:
        toks.append(("str", "".join(buf)))
    return toks


def _finest(toks: list[tuple[str, str]]) -> str | None:
    finest = None
    for kind, v in toks:
        if kind == "conv" and (
            finest is None or _CONVERSIONS.index(v) > _CONVERSIONS.index(finest)
        ):
            finest = v
    return finest


def _floor(dt: datetime, gran: str) -> datetime:
    dt = dt.replace(minute=0, second=0, microsecond=0)
    if gran == "Y":
        return dt.replace(month=1, day=1, hour=0)
    if gran == "m":
        return dt.replace(day=1, hour=0)
    if gran == "d":
        return dt.replace(hour=0)
    return dt  # H


def _advance(dt: datetime, gran: str) -> datetime:
    if gran == "H":
        return dt + timedelta(hours=1)
    if gran == "d":
        return dt + timedelta(days=1)
    if gran == "m":
        return (
            dt.replace(year=dt.year + 1, month=1)
            if dt.month == 12
            else dt.replace(month=dt.month + 1)
        )
    return dt.replace(year=dt.year + 1)


def _expand(toks: list[tuple[str, str]], dt: datetime) -> str:
    out = []
    for kind, v in toks:
        if kind == "str":
            out.append(v)
        elif v == "Y":
            out.append(str(dt.year))
        elif v == "m":
            out.append(f"{dt.month:02d}")
        elif v == "d":
            out.append(f"{dt.day:02d}")
        else:
            out.append(f"{dt.hour:02d}")
    return "".join(out)


def _norm(t, which: str) -> datetime:
    if isinstance(t, (int, float)):
        return datetime.fromtimestamp(t, tz=timezone.utc)
    if isinstance(t, str):
        try:
            s = t.replace("Z", "+00:00")
            dt = datetime.fromisoformat(s)
        except ValueError:
            raise PathEnumError(f'"{which}" is not a valid date')
    else:
        dt = t
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


def enumerate_paths(pattern: str, time_start, time_end) -> list[str]:
    """Expand ``pattern`` over [time_start, time_end).

    Accepts datetimes, ISO strings, or epoch seconds; naive datetimes
    are UTC. Pure driver-side metadata work — at 100 TB this prunes the
    *listing*, so Spark never even stats out-of-range files.
    """
    toks = _tokenize(pattern)
    start = _norm(time_start, "timeStart")
    end = _norm(time_end, "timeEnd")
    if start > end:
        raise PathEnumError('"timeStart" may not be after "timeEnd"')

    gran = _finest(toks)
    if gran is None:
        return [_expand(toks, start)]

    out: list[str] = []
    cur = _floor(start, gran)
    while True:  # first value unconditional (reference lib/path-enum.js:196-206)
        out.append(_expand(toks, cur))
        cur = _advance(cur, gran)
        if cur >= end:
            break
    return out


def prune_paths(
    root: str, pattern: str, time_start, time_end, suffix: str = "",
    exists=None,
) -> list[str]:
    """Concrete existing paths under ``root`` for the time range —
    the list to hand to spark.read (many paths → one DataFrame, one
    partition per file split).

    ``exists`` is the existence predicate. Default: ``os.path.exists``
    for local roots; for URI roots (``scheme://...``, where a
    driver-local stat is always False) every enumerated path is kept —
    pass a filesystem-aware predicate (see
    ``datasource.hadoop_exists``) to prune remote trees too.
    """
    if exists is None:
        exists = os.path.exists if "://" not in root else (lambda _p: True)
    out = []
    for rel in enumerate_paths(pattern, time_start, time_end):
        # textual root+format concatenation like the reference
        # (lib/path-enum.js): os.path.join would DISCARD the root for
        # the common slash-prefixed formats ("/%Y/%m/%d")
        p = root.rstrip("/") + "/" + (rel + suffix).lstrip("/")
        if exists(p):
            out.append(p)
    return out
