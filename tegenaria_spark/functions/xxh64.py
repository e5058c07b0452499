"""Pure-Python XXH64 — oracle twin of Spark's ``F.xxhash64``.

The reference fingerprints requests with murmur3-128
(/root/reference/dupefilters.go:99-128).  We keep the same *identity*
(hash of method‖canonical-url‖body‖headers) but use the 64-bit XXH64
because Spark ships it JVM-side (``org.apache.spark.sql.catalyst.
expressions.XxHash64``, exposed as ``F.xxhash64``), so the hot path
never leaves whole-stage codegen.  This module is the pure-Python
implementation of the same public XXH64 spec used for test oracles and
for the single-threaded reference simulator — parity with Spark is
asserted in tests/test_canonical.py.

Spark hashes a STRING column as its UTF-8 bytes with seed 42 and
returns a *signed* int64; ``xxh64`` below matches that contract.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, k: int) -> int:
    acc = (acc + k * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64_unsigned(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of *data*, returned as an unsigned 64-bit int."""
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
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 as a *signed* int64 — bit-identical to ``F.xxhash64``."""
    h = xxh64_unsigned(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    return xxh64(s.encode("utf-8"), seed)
