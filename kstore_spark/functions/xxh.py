"""Driver-side XXH64 — the same 64-bit hash Spark's ``xxhash64``
computes (seed 42), in pure Python.

Why this exists (r12, guide §1.2 "don't pay a distributed job for
driver-sized work"): the index probe paths (_pruned_postings,
_fuzzy_neighborhood) need ``pmod(xxhash64(term), buckets)`` for a
HANDFUL of literal query terms to turn them into partition predicates.
Before r12 they computed it by building a one-column DataFrame and
collecting — a full Spark job (py4j round-trip, job scheduling, one
task) per search call, pure overhead at any scale and ~0.1-0.2 s per
call on the bench host. A few dozen bytes of hashing is driver work.

Correctness contract: ``spark_xxhash64(s)`` must equal
``F.xxhash64(F.lit(s))`` for every string, and ``bucket_of`` must
equal ``F.pmod(F.xxhash64(col), F.lit(n))``. Spark hashes the UTF-8
bytes of a string with the reference XXH64 algorithm (Collet's
xxHash, public domain; Spark pins the official test vectors in its own
XXH64Suite) under seed 42. Pinned against the live engine in
tests/test_text_differential.py::test_python_xxh64_matches_spark, including
multi-byte UTF-8 and every length class of the finalization ladder.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 over ``data`` → unsigned 64-bit int. Seed
    defaults to 42 = Spark's fixed ``xxhash64`` seed."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def spark_xxhash64(s: str) -> int:
    """``F.xxhash64(F.lit(s))`` as a SIGNED 64-bit int (Spark's hash
    functions return LongType)."""
    u = xxh64(s.encode("utf-8"))
    return u - (1 << 64) if u >= (1 << 63) else u


def bucket_of(s: str, buckets: int) -> int:
    """``F.pmod(F.xxhash64(col), F.lit(buckets))`` for a literal
    string: Python's %% on a positive modulus is floor-mod, which is
    exactly pmod's non-negative contract for signed hashes."""
    return spark_xxhash64(s) % buckets
