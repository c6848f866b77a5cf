"""Pure-Python XXH64 — an independent twin of Spark's ``xxhash64``.

Spark's ``F.xxhash64`` (seed 42, UTF-8 bytes for strings) has no DuckDB
equivalent, which left the simhash entry rows-only in the driver's
correctness gate. This module reimplements the public xxHash64
algorithm (Yann Collet's published spec, BSD) from the spec text so the
JVM result can be cross-checked value-by-value from Python: if the two
independent implementations agree on every document, the JVM signature
path is correct, and THAT agreement is a DuckDB-expressible oracle
(a column of TRUEs).

Only used in the correctness harness / twin-check query — the hot path
stays JVM-side.
"""

from __future__ import annotations

import pandas as pd

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int (Spark's convention)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def simhash64_py(tokens: list[str]) -> int:
    """Python twin of ops.dedup.simhash64: per-bit ±1 votes of
    xxhash64(token) across the token multiset, bit set when the vote
    sum is positive. Must match the JVM expression bit-for-bit."""
    votes = [0] * 64
    for t in tokens:
        h = xxhash64(t.encode("utf-8")) & _M
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def simhash_twin_udf():
    """Arrow-batched pandas_udf: array<string> tokens → Python-twin
    simhash64 (long). Factory so pyspark is only touched when a
    SparkSession exists."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _twin(toks: pd.Series) -> pd.Series:
        return toks.map(lambda ts: simhash64_py(list(ts)))

    return _twin
