"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression bit-for-bit
(seed 42), so the driver can name the bucket file a point lookup lives in
without launching a job — and without a SparkSession at all, which is what
the Python data source planner has to work with.

Spark's expression is the canonical 64-bit xxHash (Yann Collet's xxHash,
public BSD; Spark ports it in catalyst's XXH64) applied to the value's
internal representation: UTF-8 bytes for strings, raw bytes for binary,
the 8-byte value for longs, and the *32-bit* mix for int/short/byte/date/
boolean. Verified empirically against ``F.xxhash64`` across types and all
tail lengths (tests/test_engine.py::test_xxh64_matches_spark).

Only driver-side planning uses this (a handful of literals per query);
throughput is irrelevant, exactness is everything.
"""

from __future__ import annotations

import datetime

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(v: int, seed: int = SPARK_SEED) -> int:
    """xxhash64 of a BIGINT column value (two's-complement 8 bytes)."""
    v &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(v: int, seed: int = SPARK_SEED) -> int:
    """xxhash64 of an INT/SMALLINT/TINYINT/DATE/BOOLEAN column value —
    Spark hashes all of these through the 32-bit mix."""
    v &= 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (v * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(b: bytes, seed: int = SPARK_SEED) -> int:
    """Canonical XXH64 over bytes (STRING hashes its UTF-8 encoding)."""
    n = len(b)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(b[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(b[i + 8:i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(b[i + 16:i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(b[i + 24:i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(b[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(b[i:i + 4], "little")
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (b[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


#: logical types whose literals hash exactly like the column value — the
#: gate for driver-side bucket pruning. Floats/timestamps/decimals are
#: excluded: their predicate values may be normalized representations
#: (epoch micros, unscaled keys) whose hash would NOT match the column's.
HASHABLE_KEY_TYPES = frozenset(
    ["string", "binary", "int8", "int16", "int32", "int64", "bool", "date32"]
)


def spark_xxhash64(value, logical_type: str) -> int:
    """Signed 64-bit result identical to ``F.xxhash64(col)`` for a column
    of ``logical_type`` holding ``value``. Raises TypeError when the
    (value, type) pair is outside the verified matrix — callers treat that
    as "cannot prune"."""
    if logical_type == "string" and isinstance(value, str):
        return _to_signed(hash_bytes(value.encode("utf-8")))
    if logical_type == "binary" and isinstance(value, (bytes, bytearray)):
        return _to_signed(hash_bytes(bytes(value)))
    if logical_type == "int64" and isinstance(value, int) and not isinstance(value, bool):
        return _to_signed(hash_long(value))
    if (logical_type in ("int8", "int16", "int32")
            and isinstance(value, int) and not isinstance(value, bool)):
        return _to_signed(hash_int(value))
    if logical_type == "bool" and isinstance(value, bool):
        return _to_signed(hash_int(1 if value else 0))
    if (logical_type == "date32" and isinstance(value, datetime.date)
            and not isinstance(value, datetime.datetime)):
        return _to_signed(hash_int((value - datetime.date(1970, 1, 1)).days))
    raise TypeError(f"no verified xxhash64 mapping for {logical_type}: {value!r}")


def bucket_of(value, logical_type: str, buckets: int,
              salt: int = 1, salt_col: str | None = None) -> set[int]:
    """The set of bucket ids a row with this bucket-key value can live in —
    ``pmod(xxhash64(key), buckets)`` exactly as encode assigns it
    (encode.py bucket_expr). With salting, the salt term
    ``pmod(xxhash64(salt_col), salt)`` ranges over [0, salt), so the result
    expands to every salt variant. Java's % then pmod == Python's % for the
    int64-wrapped sum."""
    h = spark_xxhash64(value, logical_type)
    if salt > 1 and salt_col:
        out = set()
        for s in range(salt):
            t = h + s
            t = t - (1 << 64) if t > (1 << 63) - 1 else t  # int64 wrap
            out.add(t % buckets)
        return out
    return {h % buckets}
